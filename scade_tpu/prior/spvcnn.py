"""TPU-native SPVCNN point-cloud classifier (sparse point-voxel CNN).

Reference: ambiguity_aware_prior/lib/spvcnn_classsification.py:1-158
(SPVCNN_CLASSIFICATION + Basic{Conv,Deconv}olutionBlock + ResidualBlock),
lib/spvcnn_utils.py:12-103 (initial_voxelize / point_to_voxel /
voxel_to_point), lib/test_utils.py:9-129 (depth→pcd→sparse-tensor input
drivers, refine_focal / refine_shift). In the reference this subsystem is
dead code (imported by nothing in the main flows) and depends on
torchsparse's CUDA hash-map kernels; it is ported here for inventory
completeness with a TPU-first design:

- **Static-capacity sparse tensors.** A sparse voxel/point set is
  ``(feats (N, C), coords (N, 4) int32 [x, y, z, batch], mask (N,))``
  padded to a fixed capacity N — XLA never sees a dynamic shape.
- **Sort + merge-join kernel maps instead of GPU hash maps.** torchsparse
  builds input→output kernel maps with sphash/sphashquery (64-bit FNV on
  CUDA). Here each (offset, output-site) lookup is a lexicographic
  merge-join: pack (batch,z)/(y,x) into two int32 keys, sort table+query
  together (table rows first inside an equal-key run), forward-fill the
  last table position with a cummax scan, and test key equality. Exact
  (collision-free), fully static, O((N+M) log) compare work on the VPU.
- **Convs are gather→matmul.** For each of the K³ kernel offsets the
  matched input features are gathered and hit with the (Cin, Cout) weight
  slice — dense MXU matmuls; masked-out rows contribute zeros.
- **Masked BN / masked global-average-pool** replace torchsparse's
  BatchNorm(point-list) and GlobalAveragePooling.

Coordinate contract: voxel coordinates must fit |c| < 2**14 and batch
index < 2**16 (ample for the reference's 100k-point, ~±80 m @5 mm-voxel
inputs); values outside are clipped by the key packing.

Weight-translation parity is untestable here (the reference's own module
cannot even be imported: ``lib/spvcnn_utils.py`` does a
``from torchsparse.utils.helpers import *`` of modules absent from
torchsparse>=1.4, and torchsparse itself is not installable in this
environment), so correctness is pinned by construction instead: sparse
convs are verified against dense ``lax.conv_general_dilated`` oracles on
fully-occupied blocks, devoxelize against direct trilinear interpolation,
and padding-invariance (tests/test_spvcnn.py).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SparseVoxels(NamedTuple):
    """Fixed-capacity sparse voxel set at integer tensor stride `s`."""

    feats: jnp.ndarray  # (N, C) float
    coords: jnp.ndarray  # (N, 4) int32: x, y, z, batch — multiples of s
    mask: jnp.ndarray  # (N,) bool
    stride: int = 1  # static python int (torchsparse SparseTensor.s)


class SparsePoints(NamedTuple):
    """Fixed-capacity point set with float voxel-frame coordinates
    (torchsparse PointTensor: spvcnn_classsification.py:138)."""

    feats: jnp.ndarray  # (N, C) float
    fcoords: jnp.ndarray  # (N, 4) float: x, y, z, batch
    mask: jnp.ndarray  # (N,) bool


# ---------------------------------------------------------------------------
# key packing + merge-join (the torchsparse sphash/sphashquery replacement)
# ---------------------------------------------------------------------------

_COORD_BIAS = 1 << 14  # coords clipped to [-2^14, 2^14)


def _pack_keys(coords: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, 4) int32 [x,y,z,b] → two int32 keys (hi, lo), order-preserving
    lexicographically in (b, z, y, x). Collision-free within the
    documented coordinate contract (unlike sphash's 64-bit FNV)."""
    c = jnp.clip(coords[:, :3], -_COORD_BIAS, _COORD_BIAS - 1) + _COORD_BIAS
    b = coords[:, 3]
    hi = b * (1 << 15) + c[:, 2]  # batch, z
    lo = c[:, 1] * (1 << 15) + c[:, 0]  # y, x
    return hi, lo


def sparse_match(table: jnp.ndarray, table_mask: jnp.ndarray,
                 query: jnp.ndarray, query_mask: jnp.ndarray) -> jnp.ndarray:
    """For each query coord, the index of the equal coord in `table`
    (-1 if absent) — torchsparse's sphashquery (spvcnn_utils.py:18,48,78)
    as a static-shape sort + merge-join.

    Table coords are assumed unique among valid rows (voxel sites are)."""
    n, m = table.shape[0], query.shape[0]
    coords = jnp.concatenate([table, query], axis=0)
    valid = jnp.concatenate([table_mask, query_mask], axis=0)
    tag = jnp.concatenate(
        [jnp.zeros((n,), jnp.int32), jnp.ones((m,), jnp.int32)])
    orig = jnp.concatenate(
        [jnp.arange(n, dtype=jnp.int32), jnp.arange(m, dtype=jnp.int32)])
    hi, lo = _pack_keys(coords)
    inv = (~valid).astype(jnp.int32)  # invalid rows sort last
    # lexsort: last key is primary → (invalid, hi, lo, tag); table rows
    # precede query rows inside an equal-coord run.
    perm = jnp.lexsort((tag, lo, hi, inv))
    s_hi, s_lo = hi[perm], lo[perm]
    s_tag, s_orig, s_valid = tag[perm], orig[perm], valid[perm]
    pos = jnp.arange(n + m, dtype=jnp.int32)
    is_table = (s_tag == 0) & s_valid
    last_table = jax.lax.cummax(jnp.where(is_table, pos, -1))
    cand = jnp.clip(last_table, 0)
    hit = ((last_table >= 0)
           & (s_hi == s_hi[cand]) & (s_lo == s_lo[cand])
           & s_valid & (s_tag == 1))
    matched = jnp.where(hit, s_orig[cand], -1)
    # scatter back to query order; table rows land in the drop slot m.
    slot = jnp.where(s_tag == 1, s_orig, m)
    out = jnp.full((m + 1,), -1, jnp.int32).at[slot].set(
        jnp.where(s_tag == 1, matched, -1), mode="drop")
    return out[:m]


def sparse_unique(coords: jnp.ndarray, mask: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                             jnp.ndarray]:
    """Deduplicate valid coords (torch.unique in initial_voxelize,
    spvcnn_utils.py:17). Returns (unique_coords (N,4) compacted to the
    front, unique_mask, inverse (N,) int32 mapping each input row to its
    unique slot (-1 for invalid), counts (N,) per unique slot)."""
    n = coords.shape[0]
    hi, lo = _pack_keys(coords)
    inv_key = (~mask).astype(jnp.int32)
    perm = jnp.lexsort((lo, hi, inv_key))
    s_hi, s_lo, s_valid = hi[perm], lo[perm], mask[perm]
    first = jnp.concatenate([
        jnp.ones((1,), bool),
        (s_hi[1:] != s_hi[:-1]) | (s_lo[1:] != s_lo[:-1]),
    ]) & s_valid
    gid = jnp.cumsum(first.astype(jnp.int32)) - 1  # group id per sorted row
    n_unique = jnp.sum(first.astype(jnp.int32))
    slot = jnp.where(first, gid, n)
    ucoords = jnp.zeros((n + 1, 4), coords.dtype).at[slot].set(
        coords[perm], mode="drop")[:n]
    umask = jnp.arange(n) < n_unique
    inv_sorted = jnp.where(s_valid, gid, -1)
    inverse = jnp.zeros((n,), jnp.int32).at[perm].set(inv_sorted)
    counts = jnp.zeros((n,), jnp.int32).at[
        jnp.where(mask, inverse, n)].add(1, mode="drop")
    return ucoords, umask, inverse, counts


def _segment_mean(feats: jnp.ndarray, seg: jnp.ndarray, mask: jnp.ndarray,
                  num_segments: int) -> jnp.ndarray:
    """Masked scatter-mean (torchsparse spvoxelize: grouped sum / counts,
    spvcnn_utils.py:20-26,56)."""
    seg = jnp.where(mask, seg, num_segments)
    total = jnp.zeros((num_segments + 1, feats.shape[1]), feats.dtype
                      ).at[seg].add(jnp.where(mask[:, None], feats, 0),
                                    mode="drop")
    cnt = jnp.zeros((num_segments + 1,), feats.dtype).at[seg].add(
        jnp.where(mask, 1.0, 0.0), mode="drop")
    return total[:num_segments] / jnp.maximum(cnt[:num_segments, None], 1.0)


# ---------------------------------------------------------------------------
# sparse conv (torchsparse spnn.Conv3d semantics)
# ---------------------------------------------------------------------------


def _kernel_offsets(ks: int, stride_units: int) -> np.ndarray:
    """torchsparse KernelRegion offset grid at tensor stride s: odd kernels
    are centred ({-s..s} for ks=3), even kernels corner-aligned ({0, s}
    for ks=2) — the same convention voxel_to_point's KernelRegion(2, s)
    uses for the 8 trilinear corners (spvcnn_utils.py:70-71)."""
    if ks % 2:
        r = np.arange(-(ks // 2), ks // 2 + 1) * stride_units
    else:
        r = np.arange(ks) * stride_units
    # x fastest (matches itertools.product(z, y, x) row-major → we fix a
    # deterministic documented order; weight-file parity is untestable,
    # see module docstring).
    zz, yy, xx = np.meshgrid(r, r, r, indexing="ij")
    return np.stack([xx, yy, zz], -1).reshape(-1, 3).astype(np.int32)


def sparse_conv3d(x: SparseVoxels, weight: jnp.ndarray,
                  bias: Optional[jnp.ndarray] = None, ks: int = 3,
                  stride: int = 1) -> SparseVoxels:
    """spnn.Conv3d (spvcnn_classsification.py:14-18). `weight` is
    (ks**3, Cin, Cout).

    stride 1: outputs on the input sites. stride>1: outputs on the unique
    downsampled sites floor(c / (s*stride)) * (s*stride), tensor stride
    s*stride — torchsparse's downsample rule."""
    s = x.stride
    if stride == 1:
        out_coords, out_mask, out_stride = x.coords, x.mask, s
    else:
        new_s = s * stride
        down = jnp.concatenate([
            jnp.floor_divide(x.coords[:, :3], new_s) * new_s,
            x.coords[:, 3:],
        ], axis=1)
        out_coords, out_mask, _, _ = sparse_unique(down, x.mask)
        out_stride = new_s
    offsets = _kernel_offsets(ks, s)
    acc = jnp.zeros((out_coords.shape[0], weight.shape[-1]), x.feats.dtype)
    for k, off in enumerate(offsets):
        q = jnp.concatenate(
            [out_coords[:, :3] + jnp.asarray(off, jnp.int32)[None, :],
             out_coords[:, 3:]], axis=1)
        idx = sparse_match(x.coords, x.mask, q, out_mask)
        hit = idx >= 0
        f = jnp.where(hit[:, None], x.feats[jnp.clip(idx, 0)], 0.0)
        acc = acc + f @ weight[k]
    if bias is not None:
        acc = acc + bias
    acc = jnp.where(out_mask[:, None], acc, 0.0)
    return SparseVoxels(acc, out_coords, out_mask, out_stride)


def sparse_conv3d_transpose(x: SparseVoxels, weight: jnp.ndarray,
                            out_sites: SparseVoxels,
                            ks: int = 3) -> SparseVoxels:
    """spnn.Conv3d(transpose=True) (spvcnn_classsification.py:27-40,
    BasicDeconvolutionBlock — defined but unused by the classifier):
    upsample back onto previously-seen finer-scale sites (torchsparse
    replays the cached downsample kernel map inverted; the layer has its
    own (ks³, Cin, Cout) weight). out[p] receives W[o] · in[p - o] for
    offsets o at the *output* stride; queries that are not multiples of
    the input stride simply find no match."""
    so = out_sites.stride
    offsets = _kernel_offsets(ks, so)
    acc = jnp.zeros((out_sites.coords.shape[0], weight.shape[-1]),
                    x.feats.dtype)
    for k, off in enumerate(offsets):
        q = jnp.concatenate(
            [out_sites.coords[:, :3] - jnp.asarray(off, jnp.int32)[None, :],
             out_sites.coords[:, 3:]], axis=1)
        idx = sparse_match(x.coords, x.mask, q, out_sites.mask)
        hit = idx >= 0
        f = jnp.where(hit[:, None], x.feats[jnp.clip(idx, 0)], 0.0)
        acc = acc + f @ weight[k]
    acc = jnp.where(out_sites.mask[:, None], acc, 0.0)
    return SparseVoxels(acc, out_sites.coords, out_sites.mask, so)


def batch_norm_masked(feats: jnp.ndarray, mask: jnp.ndarray,
                      scale: jnp.ndarray, bias: jnp.ndarray,
                      mean: Optional[jnp.ndarray] = None,
                      var: Optional[jnp.ndarray] = None,
                      eps: float = 1e-5) -> jnp.ndarray:
    """spnn.BatchNorm over the valid point list. With (mean, var) given,
    inference-mode running-stat normalization; otherwise batch stats over
    valid rows (training semantics)."""
    if mean is None:
        w = mask[:, None].astype(feats.dtype)
        n = jnp.maximum(jnp.sum(w), 1.0)
        mean = jnp.sum(feats * w, axis=0) / n
        var = jnp.sum(jnp.square(feats - mean) * w, axis=0) / n
    y = (feats - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    return jnp.where(mask[:, None], y, 0.0)


def global_avg_pool(x: SparseVoxels, num_batches: int) -> jnp.ndarray:
    """spnn.GlobalAveragePooling (spvcnn_classsification.py:117): masked
    per-sample mean over sites → (B, C)."""
    return _segment_mean(x.feats, x.coords[:, 3], x.mask, num_batches)


# ---------------------------------------------------------------------------
# point ↔ voxel (spvcnn_utils.py)
# ---------------------------------------------------------------------------


def initial_voxelize(z: SparsePoints, init_res: float, after_res: float
                     ) -> Tuple[SparseVoxels, SparsePoints]:
    """spvcnn_utils.py:12-33: rescale float coords by init_res/after_res,
    mean-pool point features into floor-voxels (stride 1). Returns the
    voxel tensor and z with its coords rescaled (the reference mutates
    z.C in place; we return the updated points)."""
    n = z.fcoords.shape[0]
    new_float = jnp.concatenate(
        [z.fcoords[:, :3] * (init_res / after_res), z.fcoords[:, 3:]], 1)
    vox = jnp.concatenate([
        jnp.floor(new_float[:, :3]).astype(jnp.int32),
        new_float[:, 3].astype(jnp.int32)[:, None],
    ], axis=1)
    ucoords, umask, inverse, _ = sparse_unique(vox, z.mask)
    feats = _segment_mean(z.feats, inverse, z.mask, n)
    feats = jnp.where(umask[:, None], feats, 0.0)
    return (SparseVoxels(feats, ucoords, umask, 1),
            SparsePoints(z.feats, new_float, z.mask))


def point_to_voxel(x: SparseVoxels, z: SparsePoints) -> SparseVoxels:
    """spvcnn_utils.py:37-61: mean-pool point features onto x's existing
    sites (points whose voxel is absent from x are dropped)."""
    s = x.stride
    pvox = jnp.concatenate([
        jnp.floor(z.fcoords[:, :3] / s).astype(jnp.int32) * s,
        z.fcoords[:, 3].astype(jnp.int32)[:, None],
    ], axis=1)
    idx = sparse_match(x.coords, x.mask, pvox, z.mask)
    feats = _segment_mean(z.feats, idx, z.mask & (idx >= 0),
                          x.coords.shape[0])
    feats = jnp.where(x.mask[:, None], feats, 0.0)
    return SparseVoxels(feats, x.coords, x.mask, s)


def voxel_to_point(x: SparseVoxels, z: SparsePoints,
                   nearest: bool = False) -> SparsePoints:
    """spvcnn_utils.py:65-103: trilinear (KernelRegion(2, s) 8-corner)
    devoxelize of x's features at z's float positions; corners absent
    from x get weight 0 (v1.x calc_ti_weights semantics — weights are NOT
    renormalized over the surviving corners). `nearest=True` zeroes the 7
    non-floor corners but keeps the floor corner's *trilinear* weight
    (reference lines 84-86 set ``weights[:, 1:] = 0`` without resetting
    ``weights[:, 0]`` to 1 — a shipped quirk we replicate)."""
    s = x.stride
    base = jnp.floor(z.fcoords[:, :3] / s)  # corner index, units of s
    frac = z.fcoords[:, :3] / s - base  # in [0, 1)
    feats = jnp.zeros((z.fcoords.shape[0], x.feats.shape[1]), x.feats.dtype)
    corners = _kernel_offsets(2, 1)  # {0,1}³, x fastest
    for off in corners:
        offj = jnp.asarray(off, jnp.float32)
        q = jnp.concatenate([
            (base + offj[None, :]).astype(jnp.int32) * s,
            z.fcoords[:, 3].astype(jnp.int32)[:, None],
        ], axis=1)
        idx = sparse_match(x.coords, x.mask, q, z.mask)
        w = jnp.prod(jnp.where(offj[None, :] > 0, frac, 1.0 - frac), axis=1)
        if nearest and bool(np.any(off != 0)):
            continue  # non-floor corners dropped; floor keeps its w0
        hit = (idx >= 0) & z.mask
        f = jnp.where(hit[:, None], x.feats[jnp.clip(idx, 0)], 0.0)
        feats = feats + f * jnp.where(hit, w, 0.0)[:, None]
    return SparsePoints(feats, z.fcoords, z.mask)


# ---------------------------------------------------------------------------
# the classifier (spvcnn_classsification.py:74-158)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SPVCNNConfig:
    """SPVCNN_CLASSIFICATION kwargs (spvcnn_classsification.py:75-84)."""

    input_channel: int = 3
    num_classes: int = 1
    cr: float = 1.0
    pres: float = 1.0
    vres: float = 1.0

    @property
    def cs(self) -> Sequence[int]:
        return [int(self.cr * c) for c in
                (32, 32, 64, 128, 256, 256, 128, 96, 96)]


def _conv_init(key, ks: int, cin: int, cout: int):
    """torchsparse Conv3d default init: uniform(-a, a) with
    a = sqrt(1 / (ks**3 * cin)) (kaiming-style fan-in)."""
    a = float(np.sqrt(1.0 / (ks ** 3 * cin)))
    return jax.random.uniform(key, (ks ** 3, cin, cout), jnp.float32, -a, a)


def _linear_init(key, cin: int, cout: int):
    kw, kb = jax.random.split(key)
    a = float(np.sqrt(1.0 / cin))
    return {
        "w": jax.random.uniform(kw, (cin, cout), jnp.float32, -a, a),
        "b": jax.random.uniform(kb, (cout,), jnp.float32, -a, a),
    }


def _bn_init(c: int):
    # weight_initialization (spvcnn_classsification.py:130-134): γ=1, β=0.
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _conv_bn(key, ks: int, cin: int, cout: int):
    return {"w": _conv_init(key, ks, cin, cout), "bn": _bn_init(cout)}


def _residual_init(key, cin: int, cout: int, ks: int = 3, stride: int = 1):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"conv1": _conv_bn(k1, ks, cin, cout),
         "conv2": _conv_bn(k2, ks, cout, cout)}
    if cin != cout or stride != 1:
        p["down"] = _conv_bn(k3, 1, cin, cout)
    return p


def init_spvcnn(key, cfg: SPVCNNConfig):
    """Parameter pytree for SPVCNN_CLASSIFICATION (layer layout mirrors
    spvcnn_classsification.py:86-128)."""
    cs = cfg.cs
    keys = iter(jax.random.split(key, 24))
    params = {
        "stem": {"conv1": _conv_bn(next(keys), 3, cfg.input_channel, cs[0]),
                 "conv2": _conv_bn(next(keys), 3, cs[0], cs[0])},
    }
    plan = [(cs[0], cs[1]), (cs[1], cs[2]), (cs[2], cs[3]), (cs[3], cs[4])]
    for i, (cin, cout) in enumerate(plan, start=1):
        params[f"stage{i}"] = {
            "down": _conv_bn(next(keys), 2, cin, cin),  # ks=2 stride=2
            "res1": _residual_init(next(keys), cin, cout),
            "res2": _residual_init(next(keys), cout, cout),
        }
    params["classifier"] = _linear_init(next(keys), cs[4], cfg.num_classes)
    params["point_transform"] = {
        "lin": _linear_init(next(keys), cs[0], cs[4]),
        "bn": _bn_init(cs[4]),
    }
    return params


def _apply_bn(p, feats, mask, train):
    if train:
        return batch_norm_masked(feats, mask, p["scale"], p["bias"])
    return batch_norm_masked(feats, mask, p["scale"], p["bias"],
                             p["mean"], p["var"])


def _conv_block(p, x: SparseVoxels, ks, stride, train) -> SparseVoxels:
    """BasicConvolutionBlock (spvcnn_classsification.py:10-24):
    conv → BN → ReLU."""
    y = sparse_conv3d(x, p["w"], ks=ks, stride=stride)
    f = _apply_bn(p["bn"], y.feats, y.mask, train)
    return y._replace(feats=jax.nn.relu(f))


def _deconv_block(p, x: SparseVoxels, out_sites: SparseVoxels, ks,
                  train) -> SparseVoxels:
    """BasicDeconvolutionBlock (spvcnn_classsification.py:27-40):
    transpose-conv → BN → ReLU. Unused by the classifier (as in the
    reference) but part of its block zoo."""
    y = sparse_conv3d_transpose(x, p["w"], out_sites, ks=ks)
    f = _apply_bn(p["bn"], y.feats, y.mask, train)
    return y._replace(feats=jax.nn.relu(f))


def _residual_block(p, x: SparseVoxels, train) -> SparseVoxels:
    """ResidualBlock (spvcnn_classsification.py:43-71), stride 1."""
    y = sparse_conv3d(x, p["conv1"]["w"], ks=3)
    f = jax.nn.relu(_apply_bn(p["conv1"]["bn"], y.feats, y.mask, train))
    y = sparse_conv3d(y._replace(feats=f), p["conv2"]["w"], ks=3)
    f = _apply_bn(p["conv2"]["bn"], y.feats, y.mask, train)
    if "down" in p:
        d = sparse_conv3d(x, p["down"]["w"], ks=1)
        fd = _apply_bn(p["down"]["bn"], d.feats, d.mask, train)
    else:
        fd = x.feats
    return y._replace(feats=jax.nn.relu(f + fd))


def spvcnn_apply(params, cfg: SPVCNNConfig, points: SparsePoints,
                 num_batches: int = 1, train: bool = False) -> jnp.ndarray:
    """SPVCNN_CLASSIFICATION.forward (spvcnn_classsification.py:136-158)
    → (num_batches, num_classes) logits.

    Faithful quirks: z0's point features feed only the final
    point-transform skip (z1.F = z1.F + transform(z0.F), line 152); the
    constructed Dropout(0.3) is never applied in forward (line 128 — it
    is defined but unused); voxel stages never see point features after
    the stem re-voxelization (line 146)."""
    x0, z = initial_voxelize(points, cfg.pres, cfg.vres)

    st = params["stem"]
    x0 = _conv_block(st["conv1"], x0, ks=3, stride=1, train=train)
    x0 = _conv_block(st["conv2"], x0, ks=3, stride=1, train=train)
    z0 = voxel_to_point(x0, z, nearest=False)

    x1 = point_to_voxel(x0, z0)
    for i in range(1, 5):
        sp = params[f"stage{i}"]
        x1 = _conv_block(sp["down"], x1, ks=2, stride=2, train=train)
        x1 = _residual_block(sp["res1"], x1, train)
        x1 = _residual_block(sp["res2"], x1, train)

    z1 = voxel_to_point(x1, z0)
    pt = params["point_transform"]
    skip = z0.feats @ pt["lin"]["w"] + pt["lin"]["b"]
    skip = _apply_bn(pt["bn"], skip, z0.mask, train)
    z1 = z1._replace(feats=z1.feats + jax.nn.relu(skip))

    y1 = point_to_voxel(x1, z1)
    pool = global_avg_pool(y1, num_batches)
    cl = params["classifier"]
    return pool @ cl["w"] + cl["b"]


# ---------------------------------------------------------------------------
# input drivers (lib/test_utils.py) — host-side numpy, then pad-to-capacity
# ---------------------------------------------------------------------------


def init_image_coor(height: int, width: int, u0: Optional[float] = None,
                    v0: Optional[float] = None):
    """test_utils.py:9-22."""
    u0 = width / 2.0 if u0 is None else u0
    v0 = height / 2.0 if v0 is None else v0
    u_u0 = np.tile(np.arange(width), (height, 1)).astype(np.float32) - u0
    v_v0 = (np.tile(np.arange(height), (width, 1)).T.astype(np.float32) - v0)
    return u_u0, v_v0


def depth_to_pcd(depth: np.ndarray, u_u0: np.ndarray, v_v0: np.ndarray,
                 f: float, invalid_value: float = 0.0):
    """test_utils.py:24-31 (mutates depth's invalid entries to 0, as the
    reference does)."""
    mask_invalid = depth <= invalid_value
    depth[mask_invalid] = 0.0
    pcd = np.stack([u_u0 / f * depth, v_v0 / f * depth, depth], axis=2)
    return pcd, ~mask_invalid


def _quantize_pad(pc: np.ndarray, feat: np.ndarray, num_points: int,
                  rng: np.random.RandomState):
    """sparse_quantize(return_index) + the >num_points random subsample
    (test_utils.py:44-52), padded to a static capacity."""
    _, inds = np.unique(pc.astype(np.int64), axis=0, return_index=True)
    if len(inds) > num_points:
        inds = rng.choice(inds, num_points, replace=False)
    pc, feat = pc[inds], feat[inds]
    n = pc.shape[0]
    cap = num_points
    coords = np.zeros((cap, 4), np.int32)
    feats = np.zeros((cap, feat.shape[1]), np.float32)
    coords[:n, :3] = pc[:cap].astype(np.int32)
    feats[:n] = feat[:cap]
    mask = np.arange(cap) < n
    return SparsePoints(jnp.asarray(feats),
                        jnp.asarray(coords, jnp.float32),
                        jnp.asarray(mask))


def pcd_to_sparsetensor(pcd: np.ndarray, mask_valid: np.ndarray,
                        voxel_size: float = 0.01, num_points: int = 100000,
                        seed: int = 0) -> SparsePoints:
    """test_utils.py:33-56: xyz features, voxel-grid quantize with the
    min-corner shift, dedup, subsample, static pad."""
    block = pcd[mask_valid].astype(np.float32)
    pc = np.round(block[:, :3] / voxel_size)
    pc -= pc.min(0, keepdims=True)
    return _quantize_pad(pc, block, num_points, np.random.RandomState(seed))


def pcd_uv_to_sparsetensor(pcd: np.ndarray, u_u0: np.ndarray,
                           v_v0: np.ndarray, mask_valid: np.ndarray,
                           f: float = 500.0, voxel_size: float = 0.01,
                           mask_side: Optional[np.ndarray] = None,
                           num_points: int = 100000,
                           seed: int = 0) -> SparsePoints:
    """test_utils.py:58-87: xyz + (u-u0)/f + (v-v0)/f features."""
    if mask_side is not None:
        mask_valid = mask_valid & mask_side
    block = np.concatenate([
        pcd[mask_valid].astype(np.float32),
        (u_u0[mask_valid] / f)[:, None].astype(np.float32),
        (v_v0[mask_valid] / f)[:, None].astype(np.float32),
    ], axis=1)
    pc = np.round(block[:, :3] / voxel_size)
    pc -= pc.min(0, keepdims=True)
    return _quantize_pad(pc, block, num_points, np.random.RandomState(seed))


def refine_focal(depth: np.ndarray, focal: float, apply_fn, u0: float,
                 v0: float) -> Tuple[float, float]:
    """test_utils.py:90-119 (single-iteration loop, as shipped): predict a
    focal scale from the uv point cloud; `apply_fn(points) -> (1, 1)`
    wraps spvcnn_apply with bound params. Returns (refined focal, scale) —
    the reference returns only the scale (:119); the refined focal is an
    API convenience."""
    u_u0, v_v0 = init_image_coor(depth.shape[0], depth.shape[1], u0, v0)
    pcd, mask_valid = depth_to_pcd(depth.copy(), u_u0, v_v0, f=focal)
    pts = pcd_uv_to_sparsetensor(pcd, u_u0, v_v0, mask_valid, f=focal,
                                 voxel_size=0.005)
    scale = float(np.asarray(apply_fn(pts)).reshape(-1)[0])
    return float(focal / scale), float(scale)


def refine_shift(depth_wshift: np.ndarray, apply_fn, focal: float,
                 u0: float, v0: float) -> float:
    """test_utils.py:101-129 (single iteration; shift clamped at 0.7 as
    shipped)."""
    u_u0, v_v0 = init_image_coor(depth_wshift.shape[0],
                                 depth_wshift.shape[1], u0, v0)
    pcd, mask_valid = depth_to_pcd(depth_wshift.copy(), u_u0, v_v0, f=focal)
    pts = pcd_to_sparsetensor(pcd, mask_valid, voxel_size=0.01)
    shift = float(np.asarray(apply_fn(pts)).reshape(-1)[0])
    return min(shift, 0.7)
