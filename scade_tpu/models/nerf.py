"""The SCADE NeRF MLP as a functional JAX model.

Architecture matches the reference (reference: model/run_nerf_helpers.py:193-247):
D=8 x W=256 trunk with a skip concat of the embedded position after layer 4,
a view branch (W/2) fed by [feature, embedded_dirs, cam_latent], and
softplus(beta=10) on the density output. Init matches DenseLayer
(run_nerf_helpers.py:131-139): xavier-uniform with relu gain on hidden
layers, unit gain on output heads, zero biases.

Design: parameters are a plain pytree ``{name: {"kernel": (in, out),
"bias": (out,)}}`` — no Module framework in the hot path, so the whole
render step stays one flat jaxpr that XLA can fuse freely, and sharding is
plain tree-manipulation. Matmuls run in a configurable ``compute_dtype``
(bfloat16 on the MXU for speed; float32 for strict parity), with float32
accumulation via ``preferred_element_type``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    """Static architecture config (hashable — safe as a jit static arg)."""

    D: int = 8
    W: int = 256
    input_ch: int = 3
    input_ch_views: int = 3
    input_ch_cam: int = 0
    output_ch: int = 4  # only used when use_viewdirs=False
    skips: tuple = (4,)
    use_viewdirs: bool = True
    compute_dtype: Any = jnp.float32
    # Zero-pad the embedded-position lane (the production PE width 57) up to
    # a multiple of 128 at apply time, with matching zero kernel rows —
    # outputs unchanged (0·w contributes exactly +0.0f to the accumulator).
    # The r5 K0 sweep (tools/probe_mxu_floor.py --k0_sweep, on chip):
    # 57→155.9, 63→156.7, 64→158.4, 128→179.7 TFLOP/s — sub-128 K0 wastes
    # most of the 128-lane MXU pass, and padding to 64 recovers almost
    # nothing; 128 is the aligned target (+3.8% chain FLOPs, +15% rate ⇒
    # ~10% net). Static flag so both variants stay jit-cacheable.
    pad_input_lanes: bool = False

    def layer_in_dim(self, i: int) -> int:
        if i == 0:
            return self.input_ch
        # layer i takes a skip concat if layer i-1's output was concatenated,
        # i.e. when (i-1) in skips (reference constructor :206-207)
        if (i - 1) in self.skips:
            return self.W + self.input_ch
        return self.W


def _xavier_uniform(key, in_dim: int, out_dim: int, gain: float, dtype=jnp.float32):
    bound = gain * math.sqrt(6.0 / (in_dim + out_dim))
    return jax.random.uniform(
        key, (in_dim, out_dim), dtype=dtype, minval=-bound, maxval=bound
    )


def _dense_init(key, in_dim: int, out_dim: int, activation: str):
    # torch.nn.init.calculate_gain: relu → sqrt(2), linear → 1
    gain = math.sqrt(2.0) if activation == "relu" else 1.0
    return {
        "kernel": _xavier_uniform(key, in_dim, out_dim, gain),
        "bias": jnp.zeros((out_dim,), dtype=jnp.float32),
    }


def nerf_init(key, cfg: NeRFConfig) -> Params:
    """Initialize a params pytree matching the reference layer-for-layer."""
    keys = jax.random.split(key, cfg.D + 5)
    params: Params = {
        "pts_linears": [
            _dense_init(keys[i], cfg.layer_in_dim(i), cfg.W, "relu")
            for i in range(cfg.D)
        ]
    }
    view_in = cfg.input_ch_views + cfg.input_ch_cam + cfg.W
    params["views_linears"] = [
        _dense_init(keys[cfg.D], view_in, cfg.W // 2, "relu")
    ]
    if cfg.use_viewdirs:
        params["feature_linear"] = _dense_init(keys[cfg.D + 1], cfg.W, cfg.W, "linear")
        params["alpha_linear"] = _dense_init(keys[cfg.D + 2], cfg.W, 1, "linear")
        params["rgb_linear"] = _dense_init(keys[cfg.D + 3], cfg.W // 2, 3, "linear")
    else:
        params["output_linear"] = _dense_init(
            keys[cfg.D + 4], cfg.W, cfg.output_ch, "linear"
        )
    return params


def _dense(x, layer, compute_dtype, out_dtype=jnp.float32):
    # TPU f32 matmuls default to bf16 passes; force true f32 for parity mode.
    # bf16 compute keeps DEFAULT (single MXU pass) with f32 accumulation.
    #
    # out_dtype: hidden layers in bf16 mode pass bf16 here so ACTIVATIONS
    # stay bf16 between layers — the MXU still accumulates f32 internally
    # (preferred_element_type only sets the result store dtype), but the
    # inter-layer HBM traffic halves. At W=256 the MLP working set is
    # bandwidth-heavy: the pure-matmul chain probe measures ~2x between
    # f32 and bf16 activations at identical bf16 matmul precision
    # (tools/probe_mxu_floor.py, BASELINE.md r4). Head outputs keep f32.
    precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    y = jnp.dot(
        x.astype(compute_dtype),
        layer["kernel"].astype(compute_dtype),
        preferred_element_type=out_dtype,
        precision=precision,
    )
    return y + layer["bias"].astype(out_dtype)


def _softplus_beta10(x):
    # F.softplus(x, beta=10) == softplus(10x)/10, numerically stable via jax.nn
    return jax.nn.softplus(10.0 * x) / 10.0


def nerf_apply(params: Params, cfg: NeRFConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Forward pass on embedded inputs.

    x: (..., input_ch + input_ch_views + input_ch_cam) — embedded position
    followed by embedded view dir and (optional) camera latent, matching the
    reference input packing (run_scade_scannet.py:48-63).
    Returns (..., 4): [rgb_logits..., softplus-density] (run_nerf_helpers.py:223-247).
    """
    cd = cfg.compute_dtype
    # In bf16 mode the hidden ACTIVATIONS stay bf16 between layers (halved
    # HBM traffic — the dominant cost at W=256; see _dense). Matmul
    # accumulation is f32-internal on the MXU either way, and the head
    # outputs (rgb logits, density pre-softplus) are produced in f32, so
    # compositing/losses downstream are unchanged in dtype.
    hd = jnp.bfloat16 if cd == jnp.bfloat16 else jnp.float32
    input_pts = x[..., : cfg.input_ch]
    input_views = x[..., cfg.input_ch :]

    # lane alignment (cfg.pad_input_lanes): widen the thin embedded-position
    # operand K0 (57 at multires 9) to the next multiple of 128 with zeros,
    # and insert matching zero ROWS into the kernels that contract it (layer
    # 0, and the skip-concat segment of layer skips+1). 0·w adds exactly
    # +0.0f to each accumulator, so outputs are unchanged.
    pad = 0
    if cfg.pad_input_lanes and cfg.input_ch % 128:
        pad = 128 - cfg.input_ch % 128

    def pad_cols(v):
        return jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(0, pad)]) if pad else v

    def pad_rows(kernel, at):
        if not pad:
            return kernel
        z = jnp.zeros((pad, kernel.shape[1]), kernel.dtype)
        return jnp.concatenate([kernel[:at], z, kernel[at:]], axis=0)

    input_pts = pad_cols(input_pts)

    h = input_pts.astype(hd)
    for i, layer in enumerate(params["pts_linears"]):
        if pad and (i == 0 or (i - 1) in cfg.skips):
            layer = dict(layer, kernel=pad_rows(layer["kernel"], cfg.input_ch))
        h = jax.nn.relu(_dense(h, layer, cd, out_dtype=hd))
        if i in cfg.skips:
            h = jnp.concatenate([input_pts.astype(hd), h], axis=-1)

    if cfg.use_viewdirs:
        alpha = _dense(h, params["alpha_linear"], cd)
        feature = _dense(h, params["feature_linear"], cd, out_dtype=hd)
        h = jnp.concatenate([feature, input_views.astype(hd)], axis=-1)
        for layer in params["views_linears"]:
            h = jax.nn.relu(_dense(h, layer, cd, out_dtype=hd))
        rgb = _dense(h, params["rgb_linear"], cd)
        return jnp.concatenate([rgb, _softplus_beta10(alpha)], axis=-1)

    out = _dense(h, params["output_linear"], cd)
    return jnp.concatenate(
        [out[..., :3], _softplus_beta10(out[..., 3:])], axis=-1
    )


def nerf_num_params(params: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


# ---------------------------------------------------------------------------
# torch checkpoint translation (both directions) — keeps reference `.tar`
# checkpoints drop-in loadable and lets reference tooling read ours.
# ---------------------------------------------------------------------------


def params_from_torch_state_dict(state_dict, cfg: NeRFConfig) -> Params:
    """Translate a reference NeRF state_dict (possibly DataParallel-prefixed
    with 'module.') into our params pytree. Torch Linear stores (out, in);
    we store kernel as (in, out)."""

    def get(name):
        for k in (name, "module." + name):
            if k in state_dict:
                return np.asarray(state_dict[k], dtype=np.float32)
        raise KeyError(f"missing key {name} in torch state_dict")

    def layer(name):
        return {
            "kernel": jnp.asarray(get(name + ".weight").T),
            "bias": jnp.asarray(get(name + ".bias")),
        }

    params: Params = {
        "pts_linears": [layer(f"pts_linears.{i}") for i in range(cfg.D)],
        "views_linears": [layer("views_linears.0")],
    }
    if cfg.use_viewdirs:
        params["feature_linear"] = layer("feature_linear")
        params["alpha_linear"] = layer("alpha_linear")
        params["rgb_linear"] = layer("rgb_linear")
    else:
        params["output_linear"] = layer("output_linear")
    return params


def params_to_torch_state_dict(params: Params, prefix: str = "module.") -> dict:
    """Emit a reference-schema state_dict (numpy values, torch layout)."""
    out = {}

    def put(name, layer):
        out[prefix + name + ".weight"] = np.asarray(layer["kernel"]).T.copy()
        out[prefix + name + ".bias"] = np.asarray(layer["bias"]).copy()

    for i, layer in enumerate(params["pts_linears"]):
        put(f"pts_linears.{i}", layer)
    for i, layer in enumerate(params["views_linears"]):
        put(f"views_linears.{i}", layer)
    for name in ("feature_linear", "alpha_linear", "rgb_linear", "output_linear"):
        if name in params:
            put(name, params[name])
    return out
