"""Device-mesh parallelism for SCADE training/rendering.

The reference scales with single-process ``nn.DataParallel`` scatter/gather
over the point batch (reference: run_scade_scannet.py:438,455,466) and
carries dormant torch.distributed helpers that are never initialized
(ambiguity_aware_prior/lib/utils/comm.py; world_size pinned to 1 at
tools/train_dataparallel.py:217-219). The TPU-native replacement is a
`jax.sharding.Mesh` + sharding annotations on ONE jitted program:

- **data axis**: the ray batch shards over chips; the loss means become
  psums over ICI inserted by XLA. This is the natural parallelism for a
  NeRF (rays are embarrassingly parallel) and replaces DataParallel.
- **model axis**: optional tensor-parallel sharding of the MLP hidden
  dimension (kernels ``P(None, 'model')``) for very wide variants. For the
  default 8x256 MLP the matmuls are too small for TP to pay off — keep
  ``n_model=1`` and scale on data; the axis exists and compiles so wide
  models can flip it on.

Multi-host runs use the same program: `jax.distributed.initialize()` +
a mesh over all processes' devices; data shards ride ICI within a slice
and DCN across hosts. No code here ever addresses a device explicitly.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence] = None, n_model: int = 1) -> Mesh:
    """A (data, model) mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if devices.size % n_model != 0:
        raise ValueError(f"{devices.size} devices not divisible by n_model={n_model}")
    grid = devices.reshape(devices.size // n_model, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray/batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def nerf_param_pspecs(params) -> dict:
    """PartitionSpecs for a NeRF params pytree.

    Hidden-to-hidden kernels shard their output features over the model
    axis; every tensor with a small/indivisible dim stays replicated. With
    n_model == 1 this degenerates to full replication.
    """

    def spec(path, leaf):
        names = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if leaf.ndim == 2 and leaf.shape[1] % 128 == 0 and "kernel" in names:
            return P(None, MODEL_AXIS)
        if leaf.ndim == 1 and leaf.shape[0] % 128 == 0 and "bias" in names:
            return P(MODEL_AXIS)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(params, mesh: Mesh):
    """Place a params pytree on the mesh according to nerf_param_pspecs."""
    specs = nerf_param_pspecs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def _path_names(path) -> tuple:
    """Normalize a jax tree path to a tuple of name strings."""
    out = []
    for k in path:
        for attr in ("key", "name", "idx"):
            if hasattr(k, attr):
                out.append(str(getattr(k, attr)))
                break
        else:
            out.append(str(k))
    return tuple(out)


def state_shardings(state, mesh: Mesh, shard_model: bool = False):
    """NamedShardings for a full TrainState, matched BY TREE PATH.

    With shard_model=True, the NeRF params get `nerf_param_pspecs`, and any
    other state leaf whose tree-path SUFFIX and shape both match a param
    (the Adam mu/nu moments mirror the params subtree exactly) inherits
    that param's spec. Everything else — step counts, per-image
    scales/shifts and their moments, and any future state leaf regardless
    of its shape — replicates. With shard_model=False (the recommended
    data-parallel regime for the 8x256 MLP) everything replicates and the
    ray batch alone is sharded.
    """
    table = []
    if shard_model:
        params = state.params if hasattr(state, "params") else state
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        specs_flat = jax.tree_util.tree_flatten_with_path(
            nerf_param_pspecs(params), is_leaf=lambda x: isinstance(x, P)
        )[0]
        table = [
            (_path_names(pp), getattr(leaf, "shape", None), sp)
            for (pp, leaf), (_, sp) in zip(flat, specs_flat)
        ]

    def spec(path, leaf):
        names = _path_names(path)
        shape = getattr(leaf, "shape", None)
        for pnames, pshape, psp in table:
            if shape == pshape and names[-len(pnames):] == pnames:
                return psp
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, spec(p, x)), state
    )
