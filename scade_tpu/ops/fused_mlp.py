"""Fused positional-encoding + NeRF-MLP Pallas kernel.

The profiled bottleneck of the XLA render path is HBM traffic: each of the
~17 dense layers round-trips a (points, 256) f32 activation through HBM
(~2 KB/point/layer), capping throughput far below the MXU's compute bound.
This kernel evaluates the ENTIRE network — Fourier features, the 8x256
trunk with skip concat, the view branch, softplus density — for a tile of
points without leaving VMEM: HBM sees 6 input floats and 4 output floats
per point (~250x traffic reduction), so the matmuls become the limit.

Matches scade_tpu.models.nerf.nerf_apply / ops.embedding exactly for the
shipped architecture (use_viewdirs=True, skips=(4,), input_ch_cam=0 —
reference model/run_nerf_helpers.py:193-247). Training still uses the XLA
path (this kernel is forward-only; a custom-VJP treatment is wired via
``fused_nerf_apply`` which recomputes with the reference path in the
backward pass, keeping gradients exact).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 2048


def _flatten_params(params):
    """params pytree → ordered flat list of (kernel, bias-as-(1,D)) arrays.
    Biases go in 2D — 1D refs hit Mosaic layout restrictions."""
    out = []

    def add(layer):
        out.append(layer["kernel"])
        out.append(layer["bias"].reshape(1, -1))

    for layer in params["pts_linears"]:
        add(layer)
    add(params["alpha_linear"])
    add(params["feature_linear"])
    add(params["views_linears"][0])
    add(params["rgb_linear"])
    return out


def _pe_constants(num_freqs: int):
    """Constants for the in-kernel positional encoding.

    A naive in-kernel PE (19 concats of (T, 3) pieces) is catastrophic on
    TPU: each 3-lane piece pads to a full 128-lane tile, blowing VMEM and
    serializing on cross-lane shuffles. Instead: one MXU matmul with a 0/1
    replication matrix expands pts (T, 3) → (T, E) in the final layout
    [x, sin_f0(3), cos_f0(3), sin_f1(3), ...], a per-column scale applies
    π·2^f, and masked sin/cos finish the job — everything lane-aligned.
    """
    ed = 3 + 6 * num_freqs
    rep = np.zeros((3, ed), np.float32)
    scale = np.zeros((1, ed), np.float32)
    is_sin = np.zeros((1, ed), np.float32)
    is_cos = np.zeros((1, ed), np.float32)
    for d in range(3):
        rep[d, d] = 1.0
        scale[0, d] = 1.0
    for f in range(num_freqs):
        for d in range(3):
            c = 3 + 6 * f + d
            rep[d, c] = 1.0
            scale[0, c] = np.pi * 2.0**f
            is_sin[0, c] = 1.0
            rep[d, c + 3] = 1.0
            scale[0, c + 3] = np.pi * 2.0**f
            is_cos[0, c + 3] = 1.0
    return rep, scale, is_sin, is_cos


def _kernel(n_layers, skips, compute_dtype, pts_ref, dirs_ref, rep_ref,
            scale_ref, sin_ref, cos_ref, *wb_refs, out_ref):
    f32 = jnp.float32

    def dense(x, w_ref, b_ref):
        y = jnp.dot(
            x.astype(compute_dtype),
            w_ref[...].astype(compute_dtype),
            preferred_element_type=f32,
        )
        return y + b_ref[...].astype(f32)

    pts = pts_ref[...].astype(f32)  # (T, 3)
    dirs = dirs_ref[...].astype(f32)  # (T, 3)

    # PE via replication matmul + masked sin/cos (see _pe_constants)
    xb = jnp.dot(pts, rep_ref[...], preferred_element_type=f32) * scale_ref[...]
    emb = jnp.where(
        sin_ref[...] > 0.5, jnp.sin(xb),
        jnp.where(cos_ref[...] > 0.5, jnp.cos(xb), xb),
    )

    ed = emb.shape[-1]
    h = emb
    skip_pending = False  # avoid materializing the (T, ed+W) skip concat:
    # concat([emb, h]) @ W == emb @ W[:ed] + h @ W[ed:]
    for i in range(n_layers):
        w_ref, b_ref = wb_refs[2 * i], wb_refs[2 * i + 1]
        if skip_pending:
            y = (
                jnp.dot(
                    emb.astype(compute_dtype),
                    w_ref[: ed, :].astype(compute_dtype),
                    preferred_element_type=f32,
                )
                + jnp.dot(
                    h.astype(compute_dtype),
                    w_ref[ed:, :].astype(compute_dtype),
                    preferred_element_type=f32,
                )
                + b_ref[...].astype(f32)
            )
            skip_pending = False
        else:
            y = dense(h, w_ref, b_ref)
        h = jax.nn.relu(y)
        if i in skips:
            skip_pending = True

    base = 2 * n_layers
    alpha = dense(h, wb_refs[base], wb_refs[base + 1])  # (T, 1)
    # view branch: concat([feature, dirs]) @ Wv == feature @ Wv[:W] + dirs @ Wv[W:]
    feature = dense(h, wb_refs[base + 2], wb_refs[base + 3])  # (T, W)
    wv_ref, bv_ref = wb_refs[base + 4], wb_refs[base + 5]
    w_dim = feature.shape[-1]
    hv = (
        jnp.dot(
            feature.astype(compute_dtype),
            wv_ref[:w_dim, :].astype(compute_dtype),
            preferred_element_type=f32,
        )
        + jnp.dot(
            dirs.astype(compute_dtype),
            wv_ref[w_dim:, :].astype(compute_dtype),
            preferred_element_type=f32,
        )
        + bv_ref[...].astype(f32)
    )
    hv = jax.nn.relu(hv)
    rgb = dense(hv, wb_refs[base + 6], wb_refs[base + 7])  # (T, 3)

    # softplus(beta=10) density (models/nerf.py _softplus_beta10)
    sigma = jax.nn.softplus(10.0 * alpha) / 10.0
    out_ref[:, :3] = rgb
    out_ref[:, 3:4] = sigma


def _fused_forward(params, cfg, pts, viewdirs, tile: int, compute_dtype):
    n = pts.shape[0]
    n_tiles = -(-n // tile)
    pad = n_tiles * tile - n
    if pad:
        pts = jnp.pad(pts, ((0, pad), (0, 0)))
        viewdirs = jnp.pad(viewdirs, ((0, pad), (0, 0)))

    wb = _flatten_params(params)
    # cast weights once, outside the kernel: bf16 weights halve the VMEM
    # footprint (they are revolving-buffered per grid step) and skip a
    # per-tile cast on the VPU. Biases stay f32 (added post-accumulation).
    wb = [
        w.astype(compute_dtype) if w.ndim == 2 and w.shape[0] > 1 else w
        for w in wb
    ]
    rep, scale, is_sin, is_cos = _pe_constants(cfg.num_freqs)
    consts = [jnp.asarray(a) for a in (rep, scale, is_sin, is_cos)]
    point_spec = pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full_spec = lambda a: pl.BlockSpec(
        a.shape, lambda i, _nd=a.ndim: (0,) * _nd, memory_space=pltpu.VMEM
    )

    def kernel_entry(pts_ref, dirs_ref, rep_ref, scale_ref, sin_ref, cos_ref,
                     *rest):
        *wb_refs, out_ref = rest
        _kernel(cfg.D, cfg.skips, compute_dtype, pts_ref, dirs_ref, rep_ref,
                scale_ref, sin_ref, cos_ref, *wb_refs, out_ref=out_ref)

    out = pl.pallas_call(
        kernel_entry,
        grid=(n_tiles,),
        in_specs=[point_spec, point_spec]
        + [full_spec(c) for c in consts]
        + [full_spec(w) for w in wb],
        out_specs=pl.BlockSpec(
            (tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile, 4), jnp.float32),
    )(pts, viewdirs, *consts, *wb)
    return out[:n] if pad else out


class FusedCfg:
    """Static slice of NeRFConfig + embedder the kernel needs (hashable)."""

    def __init__(self, D, W, num_freqs, skips):
        self.D, self.W, self.num_freqs, self.skips = D, W, num_freqs, tuple(skips)

    def __hash__(self):
        return hash((self.D, self.W, self.num_freqs, self.skips))

    def __eq__(self, other):
        return (self.D, self.W, self.num_freqs, self.skips) == (
            other.D, other.W, other.num_freqs, other.skips,
        )


def supports_fusion(nerf_cfg, embed_pos, embed_dirs, input_ch_cam: int) -> bool:
    """The kernel covers the shipped architecture: viewdir branch on, no cam
    latent, identity-free log-sampled PE with include_input, raw dirs
    (multires_views=0 — the reference default, run_scade_scannet.py:1141)."""
    return (
        nerf_cfg.use_viewdirs
        and input_ch_cam == 0
        and not embed_pos.identity
        and embed_pos.include_input
        and embed_pos.log_sampling
        and embed_pos.num_freqs >= 1
        and float(embed_pos.max_freq_log2) == float(embed_pos.num_freqs - 1)
        and (embed_dirs is None or embed_dirs.num_freqs == 0)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5))
def fused_nerf_apply(params, cfg: FusedCfg, pts, viewdirs,
                     tile: int = DEFAULT_TILE, compute_dtype: Any = jnp.bfloat16):
    """Fused forward: (N, 3) normalized pts + (N, 3) dirs → (N, 4) raw.

    Differentiable: the backward pass recomputes through the pure-jnp
    reference path (rematerialization — saves only the inputs).
    """
    return _fused_forward(params, cfg, pts, viewdirs, tile, compute_dtype)


def _reference_apply(params, cfg: FusedCfg, pts, viewdirs):
    from scade_tpu.models.nerf import NeRFConfig, nerf_apply
    from scade_tpu.ops.embedding import Embedder, positional_encoding

    emb_cfg = Embedder(
        input_dims=3, num_freqs=cfg.num_freqs,
        max_freq_log2=float(cfg.num_freqs - 1),
    )
    net_cfg = NeRFConfig(
        D=cfg.D, W=cfg.W,
        input_ch=emb_cfg.out_dim, input_ch_views=3, skips=cfg.skips,
        use_viewdirs=True, compute_dtype=jnp.float32,
    )
    x = jnp.concatenate([positional_encoding(pts, emb_cfg), viewdirs], axis=-1)
    return nerf_apply(params, net_cfg, x)


def _fwd(params, cfg, pts, viewdirs, tile, compute_dtype):
    out = _fused_forward(params, cfg, pts, viewdirs, tile, compute_dtype)
    return out, (params, pts, viewdirs)


def _bwd(cfg, tile, compute_dtype, residuals, g):
    params, pts, viewdirs = residuals
    _, vjp = jax.vjp(
        lambda p, x, d: _reference_apply(p, cfg, x, d), params, pts, viewdirs
    )
    return vjp(g)


fused_nerf_apply.defvjp(_fwd, _bwd)
