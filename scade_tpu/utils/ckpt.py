"""Checkpoint IO, drop-in compatible with the reference `.tar` schema.

The reference saves ``{global_step, network_fn_state_dict,
network_fine_state_dict, optimizer_state_dict, depth_shifts, depth_scales
[, embedded_cam]}`` via torch.save to ``<ckpt_dir>/<expname>/{iter:06d}.tar``
(reference: run_scade_scannet.py:1004-1020) and on resume restores step +
weights but intentionally not optimizer state (:478-485).

We emit the same keys as torch tensors so reference tooling can read our
checkpoints, plus an extra ``scade_tpu`` key holding the full optax state
(numpy pytree) so OUR resume restores optimizers exactly — strictly better
than the reference while staying schema-compatible.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scade_tpu.models.nerf import (
    params_from_torch_state_dict,
    params_to_torch_state_dict,
)


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def find_checkpoints(ckpt_dir: str, expname: str):
    """All '*.tar' ckpts for a run, sorted (load_checkpoint :411-420 uses
    the '000.tar' suffix of the i_weights=100000 cadence; we accept any
    .tar so small test runs resume too)."""
    path = os.path.join(ckpt_dir, expname)
    if not os.path.isdir(path):
        return []
    return [
        os.path.join(path, f)
        for f in sorted(os.listdir(path))
        if f.endswith(".tar")
    ]


def save_checkpoint(path: str, state, rc, embedded_cam=None) -> None:
    """Write a reference-schema .tar (torch.save) from a TrainState."""
    import torch

    os.makedirs(os.path.dirname(path), exist_ok=True)
    coarse_sd = params_to_torch_state_dict(state.params["coarse"])
    fine_sd = params_to_torch_state_dict(state.params["fine"])
    save_dict = {
        "global_step": int(state.step),
        "network_fn_state_dict": {
            k: torch.from_numpy(np.array(v)) for k, v in coarse_sd.items()
        },
        "network_fine_state_dict": {
            k: torch.from_numpy(np.array(v)) for k, v in fine_sd.items()
        },
        # the reference stores torch Adam state here; we keep the key (empty)
        # for schema parity and store the real optimizer state under
        # 'scade_tpu' below.
        "optimizer_state_dict": {},
        "depth_shifts": torch.from_numpy(np.array(state.shifts)),
        "depth_scales": torch.from_numpy(np.array(state.scales)),
        "scade_tpu": {
            "opt_state": _to_numpy_tree(state.opt_state),
            "ss_opt_state": _to_numpy_tree(state.ss_opt_state),
            "version": 1,
        },
    }
    if embedded_cam is not None:
        save_dict["embedded_cam"] = torch.from_numpy(np.array(embedded_cam))
    torch.save(save_dict, path)


def load_checkpoint_raw(path: str) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)

    def to_np(v):
        return v.detach().cpu().numpy() if isinstance(v, torch.Tensor) else v

    out = {}
    for k, v in ckpt.items():
        if isinstance(v, dict) and k.endswith("_state_dict"):
            out[k] = {kk: to_np(vv) for kk, vv in v.items()}
        else:
            out[k] = to_np(v)
    return out


def load_params_from_checkpoint(path: str, rc) -> Tuple[dict, int, dict]:
    """(params, global_step, raw_ckpt) from ours or a reference .tar."""
    raw = load_checkpoint_raw(path)
    params = {
        "coarse": params_from_torch_state_dict(
            raw["network_fn_state_dict"], rc.nerf_coarse
        )
    }
    if "network_fine_state_dict" in raw and rc.nerf_fine is not None:
        params["fine"] = params_from_torch_state_dict(
            raw["network_fine_state_dict"], rc.nerf_fine
        )
    else:
        params["fine"] = params["coarse"]
    return params, int(raw.get("global_step", 0)), raw


def restore_train_state(path: str, state, rc):
    """Resume a TrainState from a .tar: params + scales/shifts always;
    optimizer state too when the ckpt is ours (has the 'scade_tpu' key)."""
    params, step, raw = load_params_from_checkpoint(path, rc)
    kwargs = dict(
        params=params,
        step=jnp.asarray(step, jnp.int32),
    )
    if "depth_scales" in raw:
        kwargs["scales"] = jnp.asarray(raw["depth_scales"], jnp.float32).reshape(
            state.scales.shape
        )
    if "depth_shifts" in raw:
        kwargs["shifts"] = jnp.asarray(raw["depth_shifts"], jnp.float32).reshape(
            state.shifts.shape
        )
    extra = raw.get("scade_tpu")
    if extra is not None:
        # Each optimizer restores independently: a structure drift (optax
        # upgrade, changed architecture) in ONE of them must not crash the
        # resume or reset the other. The moments can't be restored across a
        # drift, but the LR schedule must still resume decayed — a
        # silently-fresh count=0 would rerun the staircase from lrate at
        # step `step`.
        def _restore_opt(name, ref_state):
            ref_leaves = jax.tree.leaves(ref_state)
            got_leaves = jax.tree.leaves(extra[name])
            if len(ref_leaves) == len(got_leaves):
                return jax.tree.unflatten(
                    jax.tree.structure(ref_state),
                    [jnp.asarray(x) for x in got_leaves],
                )
            print(
                f"WARNING: checkpoint {name} has {len(got_leaves)} leaves, "
                f"expected {len(ref_leaves)}; reinitializing moments and "
                f"fast-forwarding the LR schedule to step {step}"
            )
            return _fast_forward_count(ref_state, step)

        kwargs["opt_state"] = _restore_opt("opt_state", state.opt_state)
        kwargs["ss_opt_state"] = _restore_opt("ss_opt_state", state.ss_opt_state)
    else:
        # reference checkpoint: no optax state. Fast-forward the Adam update
        # counts to the restored step so the staircase LR schedule resumes
        # at the right rate (the reference also resets Adam moments on
        # resume — run_scade_scannet.py:478-485 — so this matches it).
        kwargs["opt_state"] = _fast_forward_count(state.opt_state, step)
        kwargs["ss_opt_state"] = _fast_forward_count(state.ss_opt_state, step)
    return state._replace(**kwargs)


def _fast_forward_count(opt_state, step: int):
    """Set every scalar int32 'count' leaf in an optax state to `step`."""

    def bump(leaf):
        if hasattr(leaf, "shape") and leaf.shape == () and leaf.dtype == jnp.int32:
            return jnp.asarray(step, jnp.int32)
        return leaf

    return jax.tree.map(bump, opt_state)
