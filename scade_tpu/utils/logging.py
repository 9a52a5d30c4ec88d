"""Observability: running metric means + TensorBoard writer.

``MeanTracker`` mirrors the reference train_utils/logging.py:5-34 (weighted
running means, same print format so metrics.txt diffs cleanly).
``Writer`` wraps torch.utils.tensorboard when available and degrades to a
JSONL scalar log otherwise, keeping the reference's tag names
(run_scade_scannet.py:1022-1074).
"""

from __future__ import annotations

import json
import os
import sys
from typing import Optional


class MeanTracker:
    """Weighted running means over metric dicts (train_utils/logging.py:5-34)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._sums = {}
        self._count = 0

    def add(self, metrics: dict, weight: float = 1.0):
        for key, value in metrics.items():
            value = float(value)
            if key not in self._sums:
                self._sums[key] = value * weight
            else:
                self._sums[key] += value * weight
        self._count += weight

    def has(self, key: str) -> bool:
        return key in self._sums

    def get(self, key: str) -> float:
        return self._sums[key] / max(self._count, 1e-12)

    def as_dict(self) -> dict:
        return {k: self.get(k) for k in self._sums}

    def print(self, f=None):
        f = f or sys.stdout
        for key in self._sums:
            f.write(f"{key}: {self.get(key)}\n")


class SmoothedValue:
    """Median/average over a sliding window (reference
    lib/utils/logging.py SmoothedValue — median filtering suppresses loss
    spikes in the printed stats)."""

    def __init__(self, window_size: int = 20):
        from collections import deque

        self._deque = deque(maxlen=window_size)
        self._total = 0.0
        self._count = 0

    def AddValue(self, value: float):
        self._deque.append(float(value))
        self._total += float(value)
        self._count += 1

    def GetMedianValue(self) -> float:
        import numpy as np

        return float(np.median(list(self._deque))) if self._deque else 0.0

    def GetAverageValue(self) -> float:
        import numpy as np

        return float(np.mean(list(self._deque))) if self._deque else 0.0

    def GetGlobalAverageValue(self) -> float:
        return self._total / max(self._count, 1)


class TrainingStats:
    """Median-smoothed loss tracking + periodic logging (reference
    lib/utils/training_stats.py:19-100)."""

    def __init__(self, log_period: int = 20, total_iters=None, writer=None):
        from collections import defaultdict

        from scade_tpu.utils.profiling import StepTimer

        self.log_period = log_period
        self.writer = writer
        self.iter_timer = StepTimer(total_steps=total_iters, warmup=1)
        self.smoothed_losses = defaultdict(lambda: SmoothedValue(log_period))
        self.smoothed_total_loss = SmoothedValue(log_period)

    def IterTic(self):
        self.iter_timer.tic()

    def IterToc(self):
        return self.iter_timer.toc()

    def UpdateIterStats(self, loss: dict):
        for k, v in loss.items():
            if k != "total_loss":
                self.smoothed_losses[k].AddValue(float(v))
        self.smoothed_total_loss.AddValue(float(loss["total_loss"]))

    def GetStats(self, cur_iter: int, cur_epoch: int, lr=None) -> dict:
        stats = {
            "iter": cur_iter,
            "epoch": cur_epoch,
            "time": self.iter_timer.average,
            "eta": self.iter_timer.eta_string(cur_iter),
            "total_loss": self.smoothed_total_loss.GetMedianValue(),
        }
        if lr is not None:
            stats["lr"] = lr
        for k, v in self.smoothed_losses.items():
            stats[k] = v.GetMedianValue()
        return stats

    def LogIterStats(self, cur_iter: int, cur_epoch: int, lr=None):
        if cur_iter % self.log_period != 0:
            return
        stats = self.GetStats(cur_iter, cur_epoch, lr)
        print(
            " ".join(
                f"{k}: {v:.5f}" if isinstance(v, float) else f"{k}: {v}"
                for k, v in stats.items()
            )
        )
        if self.writer is not None:
            for k, v in stats.items():
                if isinstance(v, (int, float)) and k not in ("iter", "epoch"):
                    self.writer.add_scalar(k, float(v), cur_iter)


def make_image_grid(images, unnormalize=None):
    """Stack a batch of HWC images into one tall image (the reference's
    torchvision make_grid(nrow=1) — train_utils/logging.py:49-58). 4-channel
    rgbd batches produce [rgb | depth] side by side.

    `unnormalize` entries are Normalize-style (mean, std) params — the
    inverted dict from get_pretrained_normalize()[1] — applied with
    torchvision Normalize semantics ``(x - mean) / std`` (so inverted params
    (-m/s, 1/s) undo an ImageNet normalization: (x + m/s)·s = x·s + m)."""
    import numpy as np

    imgs = np.asarray(images)
    if imgs.ndim == 3:
        imgs = imgs[..., None]
    C = imgs.shape[-1]
    if C == 4:
        rgb = imgs[..., :3]
        depth = imgs[..., 3:]
        if unnormalize is not None:
            mean, std = unnormalize["rgbd"][0][:3], unnormalize["rgbd"][1][:3]
            rgb = (rgb - mean) / std
        grid_rgb = np.concatenate(list(rgb), axis=0)
        grid_d = np.concatenate(list(np.repeat(depth, 3, axis=-1)), axis=0)
        return np.concatenate([grid_rgb, grid_d], axis=1)
    if C == 3 and unnormalize is not None:
        mean, std = unnormalize["rgb"]
        imgs = (imgs - mean) / std
    if C == 1:
        imgs = np.repeat(imgs, 3, axis=-1)
    return np.concatenate(list(imgs), axis=0)


def print_network_info(params, name: str = "model"):
    """Parameter count summary (train_utils/logging.py:60-64)."""
    import jax
    import numpy as np

    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"{name}: {n / 1e6:.3f} M parameters")
    return n


class Writer:
    """TensorBoard scalar/image writer with a JSONL fallback."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=log_dir)
        except Exception:
            pass
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")

    def add_scalars(self, tag: str, values: dict, step: int):
        if self._tb is not None:
            self._tb.add_scalars(tag, values, step)
        self._jsonl.write(
            json.dumps({"tag": tag, "values": values, "step": step}) + "\n"
        )

    def add_scalar(self, tag: str, value: float, step: int):
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        self._jsonl.write(
            json.dumps({"tag": tag, "value": float(value), "step": step}) + "\n"
        )

    def add_image(self, tag: str, image, step: int):
        """image: (H, W, 3) float in [0,1] or uint8, HWC."""
        if self._tb is not None:
            import numpy as np

            img = np.asarray(image)
            if img.dtype != "uint8":
                img = (255 * img.clip(0, 1)).astype("uint8")
            self._tb.add_image(tag, img, step, dataformats="HWC")

    def flush(self):
        if self._tb is not None:
            self._tb.flush()
        self._jsonl.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()
