"""The SCADE volumetric rendering pipeline, TPU-native.

Pipeline per ray batch (reference: run_scade_scannet.py:581-751):

  1. stratified coarse depths (+ optional per-stratum jitter),
  2. coarse MLP → compositing weights,
  3. importance resampling of the coarse weights (detached) → fine depths,
  4. fine MLP on the sorted union of depths → final rgb/depth/weights,
  5. P_depth draws from the *fine* termination distribution (differentiable
     — SCADE's space-carving loss backprops through these samples).

Design vs the reference:

- One pure function over a fixed-shape ray batch; the reference's Python
  ``batchify_rays``/``batchify`` chunk loops become a single `lax.map` over
  statically-shaped tiles (`render_ray_batch`), compiled once.
- RNG is an explicit `jax.random` key, split per consumer; deterministic
  (test-time) rendering threads no key at all.
- The mutable `render_kwargs_train` dict of the reference becomes a frozen
  `RenderConfig` (static) + a `SceneVars` pytree (dynamic arrays).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from scade_tpu.models.nerf import NeRFConfig, nerf_apply
from scade_tpu.ops.embedding import Embedder, positional_encoding
from scade_tpu.ops.rays import get_rays
from scade_tpu.ops.sampling import draw_u, draw_u_sorted, merge_sorted, sample_pdf
from scade_tpu.ops.volume import perturb_z_vals, raw2outputs, stratified_z_vals


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static rendering configuration (hashable → jit static arg)."""

    n_samples: int = 64
    n_importance: int = 128
    perturb: bool = True
    raw_noise_std: float = 0.0
    lindisp: bool = False
    is_joint: bool = False
    use_viewdirs: bool = True
    embed_pos: Embedder = dataclasses.field(default_factory=lambda: Embedder(num_freqs=9, max_freq_log2=8.0))
    # default matches get_embedder(multires_views=0): identity-only encoding,
    # so a bare RenderConfig() is self-consistent with use_viewdirs=True
    # (embed_dirs=None is only valid when use_viewdirs=False)
    embed_dirs: Optional[Embedder] = dataclasses.field(
        default_factory=lambda: Embedder(num_freqs=0, max_freq_log2=-1.0)
    )
    # MLP input widths must match the default embedders above
    # (embed_pos.out_dim = 57, embed_dirs.out_dim = 3) — a bare
    # RenderConfig() renders; make_render_config() keeps them in sync
    # for every other flag combination
    nerf_coarse: NeRFConfig = dataclasses.field(
        default_factory=lambda: NeRFConfig(input_ch=57, input_ch_views=3, output_ch=5)
    )
    nerf_fine: Optional[NeRFConfig] = dataclasses.field(
        default_factory=lambda: NeRFConfig(input_ch=57, input_ch_views=3, output_ch=5)
    )
    input_ch_cam: int = 0
    # evaluate PE+MLP with the fused Pallas kernel (ops/fused_mlp.py) when
    # the architecture is supported; ignored otherwise
    use_fused: bool = False
    fused_tile: int = 2048
    # inverse-CDF lookups via the Pallas sweep kernel (ops/fused_sampling.py);
    # 1-ulp-identical to the XLA path, opt-in. Only compiles at M <= 128
    # bins on TPU — the P_depth site (M=191, i.e. ANY reference-default
    # config) raises a ValueError naming the limit instead of crashing the
    # remote compiler; leave this off unless n_samples keeps every
    # sample_pdf site at or below 128 bins.
    fused_sampling: bool = False

    def test_mode(self) -> "RenderConfig":
        """perturb off, no density noise (reference render_kwargs_test :505-507)."""
        return dataclasses.replace(self, perturb=False, raw_noise_std=0.0)


def make_render_config(
    multires: int = 9,
    multires_views: int = 0,
    i_embed: int = 0,
    netdepth: int = 8,
    netwidth: int = 256,
    netdepth_fine: int = 8,
    netwidth_fine: int = 256,
    n_samples: int = 64,
    n_importance: int = 128,
    perturb: bool = True,
    raw_noise_std: float = 0.0,
    lindisp: bool = False,
    is_joint: bool = False,
    use_viewdirs: bool = True,
    input_ch_cam: int = 0,
    compute_dtype: Any = jnp.float32,
    use_fused: bool = False,
    fused_tile: int = 2048,
    fused_sampling: bool = False,
    pad_input_lanes: Optional[bool] = None,
) -> RenderConfig:
    """Build a RenderConfig from reference-style flags (create_nerf :422-509).

    pad_input_lanes: lane-align the thin embedded-position operand (K0=57)
    with zero columns + zero kernel rows — output-identical (models/nerf.py).
    None reads SCADE_PAD_K0 (default OFF: the standalone chain probe gains
    ~10% at K0=128, but the in-pipeline bench A/B measured 251.7k → 245.8k
    rays/s — the pad/relayout costs more than the aligned matmul saves once
    the embedding fuses into the pipeline; BASELINE.md r5)."""
    import os as _os

    from scade_tpu.ops.embedding import get_embedder

    if pad_input_lanes is None:
        pad_input_lanes = _os.environ.get("SCADE_PAD_K0", "0") != "0"

    embed_pos = get_embedder(multires, i_embed)
    embed_dirs = get_embedder(multires_views, i_embed) if use_viewdirs else None
    input_ch = embed_pos.out_dim
    input_ch_views = embed_dirs.out_dim if embed_dirs is not None else 0

    mk = lambda d, w: NeRFConfig(
        D=d,
        W=w,
        input_ch=input_ch,
        input_ch_views=input_ch_views,
        input_ch_cam=input_ch_cam,
        output_ch=5 if n_importance > 0 else 4,
        use_viewdirs=use_viewdirs,
        compute_dtype=compute_dtype,
        pad_input_lanes=pad_input_lanes,
    )
    return RenderConfig(
        n_samples=n_samples,
        n_importance=n_importance,
        perturb=perturb,
        raw_noise_std=raw_noise_std,
        lindisp=lindisp,
        is_joint=is_joint,
        use_viewdirs=use_viewdirs,
        embed_pos=embed_pos,
        embed_dirs=embed_dirs,
        nerf_coarse=mk(netdepth, netwidth),
        nerf_fine=mk(netdepth_fine, netwidth_fine) if n_importance > 0 else None,
        input_ch_cam=input_ch_cam,
        use_fused=use_fused,
        fused_tile=fused_tile,
        fused_sampling=fused_sampling,
    )


class SceneVars(NamedTuple):
    """Dynamic per-scene arrays threaded through rendering."""

    params_coarse: Any
    params_fine: Any  # may equal params_coarse when n_importance == 0
    bb_center: jnp.ndarray  # (3,) scene bounding-box center
    bb_scale: jnp.ndarray  # () or (3,) scale to [-1, 1]
    embedded_cam: jnp.ndarray  # (input_ch_cam,) or (0,)


def _query_network(params, nerf_cfg, rc: RenderConfig, pts, viewdirs, scene: SceneVars):
    """Embed points (+dirs +cam latent) and run the MLP (run_scade_scannet.py:48-63).

    pts: (R, S, 3); viewdirs: (R, 3) or None. Returns raw (R, S, 4).
    """
    x = (pts - scene.bb_center) * scene.bb_scale

    if rc.use_fused and viewdirs is not None:
        from scade_tpu.ops.fused_mlp import FusedCfg, fused_nerf_apply, supports_fusion

        if supports_fusion(nerf_cfg, rc.embed_pos, rc.embed_dirs, rc.input_ch_cam):
            R, S = pts.shape[:2]
            dirs_flat = jnp.broadcast_to(viewdirs[:, None, :], (R, S, 3)).reshape(-1, 3)
            fcfg = FusedCfg(nerf_cfg.D, nerf_cfg.W, rc.embed_pos.num_freqs,
                            nerf_cfg.skips)
            raw = fused_nerf_apply(
                params, fcfg, x.reshape(-1, 3), dirs_flat,
                rc.fused_tile, nerf_cfg.compute_dtype,
            )
            return raw.reshape(R, S, 4)

    embedded = positional_encoding(x, rc.embed_pos)
    if viewdirs is not None:
        dirs = positional_encoding(viewdirs, rc.embed_dirs)
        dirs = jnp.broadcast_to(dirs[:, None, :], pts.shape[:2] + (dirs.shape[-1],))
        feats = [embedded, dirs]
        if rc.input_ch_cam > 0:
            cam = jnp.broadcast_to(
                scene.embedded_cam, pts.shape[:2] + (rc.input_ch_cam,)
            )
            feats.append(cam)
        embedded = jnp.concatenate(feats, axis=-1)
    return nerf_apply(params, nerf_cfg, embedded)


def _density_noise(key, shape, std: float):
    if std <= 0.0 or key is None:
        return 0.0
    return jax.random.normal(key, shape) * std


def render_rays(
    scene: SceneVars,
    rc: RenderConfig,
    rays_o,
    rays_d,
    near,
    far,
    viewdirs=None,
    key=None,
    cached_u=None,
):
    """Render a (N, 3) ray batch. Returns the reference's ret dict
    (run_scade_scannet.py:733-745) as a plain dict of arrays.

    near/far: scalars or (N, 1) arrays. key: None ⇒ fully deterministic
    (linspace u draws, no jitter) — the test-time path.
    """
    n_rays = rays_o.shape[0]
    near = jnp.broadcast_to(jnp.asarray(near, jnp.float32), (n_rays, 1))
    far = jnp.broadcast_to(jnp.asarray(far, jnp.float32), (n_rays, 1))
    if rc.use_viewdirs and viewdirs is None:
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    if not rc.use_viewdirs:
        viewdirs = None

    # key=None is the documented fully-deterministic path even when the
    # config says perturb: the u draws must fall back to linspace (det)
    # exactly like the jitter/noise paths guard on key is None below
    det = (not rc.perturb) or key is None
    if key is not None:
        k_perturb, k_noise0, k_imp, k_noise1, k_out = jax.random.split(key, 5)
    else:
        k_perturb = k_noise0 = k_imp = k_noise1 = k_out = None

    if rc.fused_sampling:
        from scade_tpu.ops.fused_sampling import fused_sample_pdf as _sample_pdf
    else:
        _sample_pdf = sample_pdf

    # --- coarse pass -------------------------------------------------------
    z_vals = stratified_z_vals(near, far, rc.n_samples, rc.lindisp)
    if rc.perturb and k_perturb is not None:
        z_vals = perturb_z_vals(z_vals, jax.random.uniform(k_perturb, z_vals.shape))

    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
    raw = _query_network(scene.params_coarse, rc.nerf_coarse, rc, pts, viewdirs, scene)
    noise0 = _density_noise(k_noise0, raw[..., 3].shape, rc.raw_noise_std)
    rgb_map, disp_map, acc_map, weights, depth_map = raw2outputs(
        raw, z_vals, rays_d, noise0
    )

    if rc.n_importance == 0:
        # Single-network mode with two tiers of P_depth draws
        # (run_scade_scannet.py:664-695). The reference crashes here on an
        # undefined `u`; we return the second-tier draws' u instead.
        z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        # sorted-order-statistic draws (distributionally identical to iid;
        # every consumer is order-invariant) make z_vals_2 ascending, so the
        # union is a cheap merge instead of a full sort (see ops/sampling.py)
        u1 = draw_u_sorted(k_imp, n_rays, rc.n_samples, det=det, joint=rc.is_joint)
        z_vals_2 = _sample_pdf(z_mid, weights[..., 1:-1], u1)

        pts2 = rays_o[..., None, :] + rays_d[..., None, :] * z_vals_2[..., :, None]
        raw2 = _query_network(
            scene.params_coarse, rc.nerf_coarse, rc, pts2, viewdirs, scene
        )
        z_all, raw_all = merge_sorted(z_vals, z_vals_2, raw, raw2)
        noise1 = _density_noise(k_noise1, raw_all[..., 3].shape, rc.raw_noise_std)
        rgb_map, disp_map, acc_map, weights, depth_map = raw2outputs(
            raw_all, z_all, rays_d, noise1
        )

        z_mid2 = 0.5 * (z_all[..., 1:] + z_all[..., :-1])
        if cached_u is None:
            u = draw_u(k_out, n_rays, rc.n_samples, det=det, joint=rc.is_joint)
        else:
            u = cached_u
        z_vals_output = _sample_pdf(z_mid2, weights[..., 1:-1], u)
        pred_hyp = jnp.concatenate([z_vals_2, z_vals_output], axis=-1)

        return {
            "rgb_map": rgb_map,
            "disp_map": disp_map,
            "acc_map": acc_map,
            "depth_map": depth_map,
            "z_vals": z_all,
            "weights": weights,
            "pred_hyp": pred_hyp,
            "u": u,
        }

    # --- fine pass (the shipped configuration) ----------------------------
    rgb0, disp0, acc0, depth0, z0, w0 = (
        rgb_map, disp_map, acc_map, depth_map, z_vals, weights,
    )

    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    # sorted-order-statistic draws (same joint law as iid — consumers are
    # order-invariant) keep z_samples ascending so the coarse∪fine union is
    # an O(S) merge, not a sort (418 ms/65k rays on TPU — BASELINE.md)
    u_imp = draw_u_sorted(k_imp, n_rays, rc.n_importance, det=det)
    z_samples = _sample_pdf(z_mid, weights[..., 1:-1], u_imp)
    # fine positions don't backprop into coarse weights (reference :711)
    z_samples = jax.lax.stop_gradient(z_samples)

    z_all = merge_sorted(z_vals, z_samples)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_all[..., :, None]
    raw = _query_network(scene.params_fine, rc.nerf_fine, rc, pts, viewdirs, scene)
    noise1 = _density_noise(k_noise1, raw[..., 3].shape, rc.raw_noise_std)
    rgb_map, disp_map, acc_map, weights, depth_map = raw2outputs(
        raw, z_all, rays_d, noise1
    )

    # --- P_depth draws from the fine termination distribution -------------
    z_mid2 = 0.5 * (z_all[..., 1:] + z_all[..., :-1])
    if cached_u is None:
        u = draw_u(k_out, n_rays, rc.n_importance, det=det, joint=rc.is_joint)
    else:
        u = cached_u
    pred_hyp = _sample_pdf(z_mid2, weights[..., 1:-1], u)  # differentiable

    # NOTE: the reference reuses the variable `z_samples` for the P_depth
    # draws before computing z_std (run_scade_scannet.py:726-745), so z_std
    # is the std of pred_hyp (population std, unbiased=False).
    z_std = jnp.std(pred_hyp, axis=-1)

    return {
        "rgb_map": rgb_map,
        "disp_map": disp_map,
        "acc_map": acc_map,
        "depth_map": depth_map,
        "z_vals": z_all,
        "weights": weights,
        "pred_hyp": pred_hyp,
        "u": u,
        "rgb0": rgb0,
        "disp0": disp0,
        "acc0": acc0,
        "depth0": depth0,
        "z_vals0": z0,
        "weights0": w0,
        "z_std": z_std,
    }


def render_ray_batch(
    scene: SceneVars,
    rc: RenderConfig,
    rays_o,
    rays_d,
    near,
    far,
    chunk: int = 32768,
    key=None,
    outputs: Optional[tuple] = None,
):
    """Render an arbitrary number of rays via static-shape tiling.

    Pads to a multiple of ``chunk``, reshapes to (n_tiles, chunk, ...), and
    `lax.map`s the tile renderer — the jit-friendly replacement for the
    reference's Python ``batchify_rays`` loop (run_scade_scannet.py:66-78).

    ``outputs``: optional tuple of ret-dict keys to keep. Each lax.map tile
    STACKS every returned leaf into an (n_tiles, chunk, ...) HBM buffer
    before the caller can select from the dict, so consumers that need only
    a few maps (bench, metrics) should name them here rather than relying
    on scan-output DCE.
    """
    n = rays_o.shape[0]

    def norm_bound(x):
        # (N,) per-ray bounds -> (N, 1), the shape render_rays broadcasts;
        # normalized HERE so the n <= chunk early return accepts the
        # reference render() contract ("near: float or array of shape
        # [batch_size]") exactly like the tiled path below
        x = jnp.asarray(x, dtype=rays_o.dtype)
        return x[:, None] if x.ndim == 1 else x

    near, far = norm_bound(near), norm_bound(far)
    if n <= chunk:
        out = render_rays(scene, rc, rays_o, rays_d, near, far, key=key)
        if outputs is not None:
            out = {k: out[k] for k in outputs}
        return out

    n_tiles = -(-n // chunk)
    pad = n_tiles * chunk - n
    ro = jnp.pad(rays_o, ((0, pad), (0, 0)), mode="edge")
    rd = jnp.pad(rays_d, ((0, pad), (0, 0)), mode="edge")
    ro = ro.reshape(n_tiles, chunk, 3)
    rd = rd.reshape(n_tiles, chunk, 3)

    def per_ray(x):
        # tile the normalized scalar / (N, 1) bounds to (n_tiles, chunk, 1)
        # so per-ray values survive the chunking
        if x.ndim == 0:
            x = x.reshape(1, 1)
        x = jnp.broadcast_to(x, (n, 1))
        x = jnp.pad(x, ((0, pad), (0, 0)), mode="edge")
        return x.reshape(n_tiles, chunk, 1)

    nr, fr = per_ray(near), per_ray(far)

    if key is not None:
        keys = jax.random.split(key, n_tiles)
    else:
        keys = None

    def tile(args):
        if keys is None:
            tro, trd, tnr, tfr = args
            tkey = None
        else:
            tro, trd, tnr, tfr, tkey = args
        out = render_rays(scene, rc, tro, trd, tnr, tfr, key=tkey)
        if outputs is not None:
            out = {k: out[k] for k in outputs}
        return out

    out = jax.lax.map(
        tile, (ro, rd, nr, fr) if keys is None else (ro, rd, nr, fr, keys)
    )
    return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:])[:n], out)


import functools


@functools.lru_cache(maxsize=32)
def _image_render_fn(rc: RenderConfig, H: int, W: int, chunk: int,
                     with_5_9: bool, outputs: Optional[tuple] = None):
    """One jitted whole-image render per (config, shape): everything —
    ray-grid generation, tiling, the lax.map over chunks — compiles into a
    single program. Per-op eager dispatch is expensive on remote/tunneled
    devices, and eval renders many images at identical shapes."""

    @jax.jit
    def fn(scene, intrinsic, c2w, near, far):
        rays_o, rays_d = get_rays(H, W, intrinsic, c2w)
        w_out = W
        if with_5_9:
            w_out = int(H / 9.0 * 16.0 / 3.0)
            if w_out % 2 != 0:
                w_out -= 1
            start = (W - w_out) // 2
            rays_o = rays_o[:, start : start + w_out, :]
            rays_d = rays_d[:, start : start + w_out, :]
        out = render_ray_batch(
            scene, rc, rays_o.reshape(-1, 3), rays_d.reshape(-1, 3),
            near, far, chunk=chunk, outputs=outputs,
        )
        return jax.tree.map(
            lambda x: x.reshape((H, w_out) + x.shape[1:]), out
        )

    return fn


@functools.lru_cache(maxsize=32)
def _image_render_fn_sharded(rc: RenderConfig, H: int, W: int, chunk: int,
                             with_5_9: bool, mesh,
                             outputs: Optional[tuple] = None):
    """Multi-device whole-image render: the flattened ray grid is split
    over EVERY mesh device with shard_map (rays are embarrassingly
    parallel — no collectives inside), params replicate, and the finished
    maps are replicated back across the mesh (one all-gather of the small
    output images) so EVERY process holds the assembled result — this is
    what makes the path valid multihost: each host renders only its ray
    shard and fetches the full image from its local devices. The reference
    evaluates on one GPU (run_scade_scannet.py:304-394); this is the
    TPU-native scale-out for test/video rendering, complementing the
    data-parallel train step (train/step.py)."""
    from jax import shard_map
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    split = P(tuple(mesh.axis_names))

    @jax.jit
    def fn(scene, intrinsic, c2w, near, far):
        rays_o, rays_d = get_rays(H, W, intrinsic, c2w)
        w_out = W
        if with_5_9:
            w_out = int(H / 9.0 * 16.0 / 3.0)
            if w_out % 2 != 0:
                w_out -= 1
            start = (W - w_out) // 2
            rays_o = rays_o[:, start : start + w_out, :]
            rays_d = rays_d[:, start : start + w_out, :]
        ro = rays_o.reshape(-1, 3)
        rd = rays_d.reshape(-1, 3)
        n = ro.shape[0]
        per = -(-n // n_dev)
        pad = per * n_dev - n
        ro = jnp.pad(ro, ((0, pad), (0, 0)), mode="edge")
        rd = jnp.pad(rd, ((0, pad), (0, 0)), mode="edge")

        def local(scene, ro, rd, near, far):
            return render_ray_batch(
                scene, rc, ro, rd, near, far, chunk=min(chunk, per),
                outputs=outputs,
            )

        out = shard_map(
            local, mesh=mesh,
            in_specs=(P(), split, split, P(), P()),
            out_specs=split,
        )(scene, ro, rd, near, far)
        res = jax.tree.map(
            lambda x: x[:n].reshape((H, w_out) + x.shape[1:]), out
        )
        # replicate the assembled maps over the mesh: multihost processes
        # can only fetch addressable shards, so without this each host
        # would hold a horizontal stripe of the image. Single-process this
        # is a cheap local all-gather of a few H*W maps.
        return jax.lax.with_sharding_constraint(res, NamedSharding(mesh, P()))

    return fn


def render_image(
    scene: SceneVars,
    rc: RenderConfig,
    H: int,
    W: int,
    intrinsic,
    c2w,
    near,
    far,
    chunk: int = 16384,
    with_5_9: bool = False,
    mesh=None,
    outputs: Optional[tuple] = None,
):
    """Full-image deterministic render (reference render() with c2w
    :106-116). Returns the ret dict with (H, W, ...) leaves.

    ``mesh``: optional jax.sharding.Mesh — rays shard over all its
    devices (see _image_render_fn_sharded); None renders on one device.

    ``outputs``: optional tuple of ret-dict keys to materialize. The jitted
    whole-image program stacks EVERY returned leaf into (H, W, ...) HBM
    buffers (jit outputs are not DCE'd), and the per-sample leaves
    (z_vals/weights/pred_hyp/u, ~192 floats per ray) dominate — a full-res
    eval that only reads rgb/depth wastes ~1 GB per image without this."""
    if mesh is not None and np.prod(list(mesh.shape.values())) > 1:
        fn = _image_render_fn_sharded(rc.test_mode(), H, W, chunk, with_5_9,
                                      mesh, outputs)
    else:
        fn = _image_render_fn(rc.test_mode(), H, W, chunk, with_5_9, outputs)
    return fn(
        scene, jnp.asarray(intrinsic), jnp.asarray(c2w),
        jnp.float32(near), jnp.float32(far),
    )
