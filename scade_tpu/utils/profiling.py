"""Tracing / profiling / numeric-debug hooks.

The reference has no profiling beyond a tic/toc Timer feeding ETA prints
(SURVEY.md §5.1) and a NaN/Inf sweep behind a DEBUG flag
(run_scade_scannet.py:37,747-749). TPU-native equivalents:

- ``trace(logdir)``: a context manager around ``jax.profiler`` — produces
  XPlane traces viewable in TensorBoard/XProf (op-level TPU timelines,
  HBM usage, MXU utilization).
- ``StepTimer``: wall-clock per-step stats with ETA, mirroring the
  reference Timer/TrainingStats prints.
- ``enable_nan_debugging()``: jax.debug_nans — jit-compatible NaN tripwire
  (replaces the host-side scan over returned tensors).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Profile everything inside the block to `logdir` (TensorBoard XProf)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for the profiler timeline (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


def enable_nan_debugging(enable: bool = True):
    """Raise on NaN production inside jitted code (debug builds only — this
    de-optimizes; the reference equivalent is the DEBUG sweep at
    run_scade_scannet.py:747-749)."""
    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    """Running per-step timing + ETA (reference lib/utils/timer.py:1-35 and
    TrainingStats ETA, lib/utils/training_stats.py:77-88)."""

    def __init__(self, total_steps: Optional[int] = None, warmup: int = 2):
        self.total_steps = total_steps
        self.warmup = warmup
        self.reset()

    def reset(self):
        self._count = 0
        self._sum = 0.0
        self._t0 = None

    def tic(self):
        self._t0 = time.perf_counter()

    def toc(self) -> float:
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:  # skip compile iterations
            self._sum += dt
        return dt

    @property
    def average(self) -> float:
        n = max(self._count - self.warmup, 1)
        return self._sum / n

    def eta_seconds(self, step: int) -> Optional[float]:
        if self.total_steps is None or self._count <= self.warmup:
            return None
        return (self.total_steps - step) * self.average

    def eta_string(self, step: int) -> str:
        eta = self.eta_seconds(step)
        if eta is None:
            return "eta --:--"
        h, rem = divmod(int(eta), 3600)
        m, s = divmod(rem, 60)
        return f"eta {h:d}:{m:02d}:{s:02d}"
