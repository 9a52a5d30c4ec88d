"""LeReS/cIMLE prior loss suite in JAX.

Re-implements the reference losses (reference: ambiguity_aware_prior/lib/models/
ILNR_loss.py, MSGIL_loss.py, ranking_loss.py, PWN_edges.py, PWN_planes.py,
Surface_normal.py) with TPU-native static shapes: every dynamic
masked_select / nonzero / randperm in the reference becomes fixed-count
inverse-CDF sampling over the validity mask (masked_sample; the plane loss
shares one argsort partition across its instances — see pwn_planes_loss),
which keeps one compiled program for every image while sampling uniformly
over exactly the same support.

Faithfulness notes (verified against the reference source):

- The reference's ILNR/MSGIL ``transform`` is degenerate as shipped:
  ``depth_valid = depth_valid[:5]`` caps at 5 elements so the ``< 10``
  guard always fires and (mean, std) is always (0, 1)
  (ILNR_loss.py:27-40, MSGIL_loss.py:43-58). We default to that shipped
  behavior (``trimmed_stats=False``); the intended 10%-trimmed statistics
  are available behind the flag.
- The reference's MSGIL "multi-scale" loop re-downsamples from the FULL
  tensor every iteration (MSGIL_loss.py:70-74), so it adds the same
  single-scale term `scale` times. Default replicates this
  (``progressive=False``).
- PWN_edges accumulates its two edge regression terms onto the whole batch
  vector and then overwrites entry i with the random term
  (PWN_edges.py:230-240) — an indexing bug that discards the edge terms for
  B==1. We implement the evident intent (all three terms per image) and
  document the deviation.

All image tensors here are NHWC (channel-last; the reference is NCHW).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# static-shape sampling utilities
# ---------------------------------------------------------------------------


def safe_normalize(v, axis=-1, eps: float = 1e-12):
    """Unit-normalize with a smooth gradient at v == 0.

    Plain ``v / (norm(v) + eps)`` still has a NaN gradient at the origin
    (d||v||/dv = v/||v|| = 0/0) and zero vectors occur routinely here
    (padded borders, invalid depth, coincident sample points); NaN * mask
    stays NaN in the backward pass. rsqrt(sum + eps) is smooth everywhere.
    """
    return v * jax.lax.rsqrt(jnp.sum(v**2, axis=axis, keepdims=True) + eps)


_SAMPLE_BLOCK = 512


def masked_sample(key, mask_flat, n: int):
    """n i.i.d. uniform draws over indices where mask_flat (bool, (P,)) is
    True — the static-shape replacement for randperm-over-masked_select.
    Returns (idx (n,), any_valid ()).

    Implemented as inverse-CDF over the mask's cumsum;
    jax.random.categorical would materialize an (n, P) Gumbel tensor —
    terabytes at 448x448 x 15k draws.

    The search is two-level "bucketed" (same pattern as
    ops/sampling.py sample_pdf_bucketed) instead of jnp.searchsorted's
    log2(P)-round binary search: each binary-search round is a batched
    SCALAR random gather (4 useful bytes per ~512-byte TPU memory
    transaction, latency-chained across rounds), whereas one vectorized
    compare against the (P/512,) block-last table plus one CONTIGUOUS
    512-wide row gather does the same search with two memory-friendly
    steps. searchsorted(cdf, u, side='right') == #{i : cdf[i] <= u}; the
    block decomposition #{blocks fully <= u}*512 + #{in-block <= u} is
    exact because cdf is non-decreasing, so the result is bit-identical
    to the old lowering (cdf values are exact f32 integers for
    P < 2^24)."""
    P = mask_flat.shape[0]
    w = mask_flat.astype(jnp.float32)
    cdf = jnp.cumsum(w)
    total = cdf[-1]
    any_valid = total > 0
    u = jax.random.uniform(key, (n,)) * jnp.maximum(total, 1.0)
    blk = _SAMPLE_BLOCK
    nblk = -(-P // blk)
    # +inf padding never counts as <= u and pins the last block's
    # block-last to +inf, so the row index below never overflows
    cdf2d = jnp.pad(cdf, (0, nblk * blk - P),
                    constant_values=jnp.inf).reshape(nblk, blk)
    block_last = cdf2d[:, -1]
    bi = jnp.sum(block_last <= u[:, None], axis=-1)  # (n,) block index
    rows = cdf2d[bi]  # (n, blk) contiguous row gather
    idx = bi * blk + jnp.sum(rows <= u[:, None], axis=-1)
    return jnp.clip(idx, 0, P - 1), any_valid


def sobel_edges(img_2d):
    """Sobel magnitude + orientation with the reference's zero-padded-VALID
    convention (ranking_loss.py getEdge :127-143). img_2d: (H, W)."""
    kx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    ky = jnp.asarray([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], jnp.float32)

    def conv_valid(x, k):
        return jax.lax.conv_general_dilated(
            x[None, :, :, None], k[:, :, None, None], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0, :, :, 0]

    gx = conv_valid(img_2d, kx)
    gy = conv_valid(img_2d, ky)
    edges = jnp.sqrt(gx**2 + gy**2)
    thetas = jnp.arctan2(gy, gx)
    pad = lambda a: jnp.pad(a, ((1, 1), (1, 1)))
    return pad(edges), pad(thetas)


# ---------------------------------------------------------------------------
# ILNR — image-level normalized regression (MEADSTD_TANH_NORM)
# ---------------------------------------------------------------------------


def _trimmed_stats(gt_flat, valid):
    """10%-trimmed mean/std over valid depths (the *intended* transform)."""
    big = jnp.where(valid, gt_flat, jnp.inf)
    order = jnp.sort(big)
    n_valid = jnp.sum(valid)
    lo = (n_valid.astype(jnp.float32) * 0.1).astype(jnp.int32)
    hi = n_valid - lo
    ranks = jnp.arange(order.shape[0])
    in_trim = (ranks >= lo) & (ranks < hi) & jnp.isfinite(order)
    w = in_trim.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(order * w, where=jnp.isfinite(order), initial=0.0) / denom
    var = jnp.sum(((order - mean) ** 2) * w, where=jnp.isfinite(order), initial=0.0) / jnp.maximum(denom - 1.0, 1.0)
    ok = n_valid >= 10
    return jnp.where(ok, mean, 0.0), jnp.where(ok, jnp.sqrt(var), 1.0)


def ilnr_loss(pred, gt, valid_threshold=-1e-8, max_threshold=1e8,
              trimmed_stats: bool = False):
    """MEADSTD_TANH_NORM_Loss (ILNR_loss.py:12-80). pred/gt: (B, H, W, 1).
    Returns per-image (B,) losses (the reference returns the batch vector)."""
    B = pred.shape[0]
    mask = (gt > valid_threshold) & (gt < max_threshold)
    m = mask.reshape(B, -1).astype(jnp.float32)
    p = pred.reshape(B, -1)
    g = gt.reshape(B, -1)

    if trimmed_stats:
        stats = [ _trimmed_stats(g[i], m[i] > 0) for i in range(B) ]
        mean = jnp.stack([s[0] for s in stats])[:, None]
        std = jnp.stack([s[1] for s in stats])[:, None]
    else:
        # shipped behavior: transform always returns (0, 1) — see module doc
        mean = jnp.zeros((B, 1), jnp.float32)
        std = jnp.ones((B, 1), jnp.float32)

    g_t = (g - mean) / (std + 1e-8)
    denom = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    l_mae = jnp.sum(jnp.abs(g_t - p) * m, axis=1) / denom
    l_tanh = jnp.sum(
        jnp.abs(jnp.tanh(0.01 * g_t) - jnp.tanh(0.01 * p)) * m, axis=1
    ) / denom
    # batches with <=100 valid pixels contribute 0 (ILNR_loss.py:51-55)
    batch_ok = (jnp.sum(m, axis=1) > 100).astype(jnp.float32)
    return (l_mae + l_tanh) * batch_ok


# ---------------------------------------------------------------------------
# MSGIL — multi-scale gradient loss
# ---------------------------------------------------------------------------


def _one_scale_gradient(pred, gt, mask):
    """MSGIL_loss.py:18-37. pred/gt/mask: (B, H, W)."""
    B = pred.shape[0]
    mf = mask.astype(pred.dtype)
    d = pred - gt
    v_mask = mf[:, :-2, :] * mf[:, 2:, :]
    v_grad = jnp.abs(d[:, :-2, :] - d[:, 2:, :]) * v_mask
    h_mask = mf[:, :, :-2] * mf[:, :, 2:]
    h_grad = jnp.abs(d[:, :, :-2] - d[:, :, 2:]) * h_mask
    valid = h_mask.reshape(B, -1).mean(-1) + v_mask.reshape(B, -1).mean(-1)
    grad = h_grad.reshape(B, -1).mean(-1) + v_grad.reshape(B, -1).mean(-1)
    return grad / (valid + 1e-8)


def msgil_loss(pred, gt, scale: int = 4, valid_threshold=-1e-8,
               trimmed_stats: bool = False, progressive: bool = False):
    """MSGIL_NORM_Loss (MSGIL_loss.py:6-77). pred/gt: (B, H, W, 1) → (B,)."""
    B = pred.shape[0]
    mask = (gt > valid_threshold)[..., 0]
    p = pred[..., 0]
    g = gt[..., 0]
    if trimmed_stats:
        m2 = mask.reshape(B, -1)
        stats = [_trimmed_stats(g.reshape(B, -1)[i], m2[i]) for i in range(B)]
        mean = jnp.stack([s[0] for s in stats])[:, None, None]
        std = jnp.stack([s[1] for s in stats])[:, None, None]
    else:
        mean, std = 0.0, 1.0
    g_t = (g - mean) / (std + 1e-8)

    total = jnp.zeros((B,), jnp.float32)
    dp, dg, dm = p, g_t, mask
    for _ in range(scale):
        dp2, dg2, dm2 = dp[:, ::2, ::2], dg[:, ::2, ::2], dm[:, ::2, ::2]
        total = total + _one_scale_gradient(dp2, dg2, dm2)
        if progressive:
            dp, dg, dm = dp2, dg2, dm2
        # shipped behavior: restart from full resolution each iteration
    return total


# ---------------------------------------------------------------------------
# Edge-guided ranking loss
# ---------------------------------------------------------------------------


def _edge_guided_pairs(key, edges, thetas, H, W, n_anchors, dist_lo, dist_hi):
    """Static-shape port of edgeGuidedSampling (ranking_loss.py:60-107):
    anchors uniform over pixels with edge >= 0.1*max; 4 offset points along
    the (absolute) gradient direction at random distances; pairs
    (a,b),(b,c),(c,d). Returns flat indices A, B of shape (3*n_anchors,)."""
    k1, k2 = jax.random.split(key)
    edges_flat = edges.reshape(-1)
    mask = edges_flat >= 0.1 * jnp.max(edges_flat)
    idx, _ = masked_sample(k1, mask, n_anchors)
    theta = thetas.reshape(-1)[idx]
    row_a = idx // W
    col_a = idx % W

    dist = jax.random.randint(k2, (4, n_anchors), dist_lo, dist_hi).astype(jnp.float32)
    sign = jnp.asarray([-1.0, -1.0, 1.0, 1.0])[:, None]
    dist = dist * sign
    col = col_a[None] + jnp.round(dist * jnp.abs(jnp.cos(theta))[None]).astype(jnp.int32)
    row = row_a[None] + jnp.round(dist * jnp.abs(jnp.sin(theta))[None]).astype(jnp.int32)
    col = jnp.clip(col, 0, W - 1)
    row = jnp.clip(row, 0, H - 1)
    flat = row * W + col  # (4, n)
    A = jnp.concatenate([flat[0], flat[1], flat[2]])
    B = jnp.concatenate([flat[1], flat[2], flat[3]])
    return A, B


def ranking_edge_loss(key, pred, gt, rgb, mask_value=-1e-8, sigma=0.03,
                      alpha=1.0, n_anchors: int = 3000):
    """EdgeguidedRankingLoss (ranking_loss.py:112-201): EGS + RS point pairs,
    squared loss on ~equal pairs, logistic ranking loss otherwise.
    pred/gt: (B, H, W, 1); rgb: (B, H, W, 3). Returns (B,)."""
    B, H, W = pred.shape[:3]

    def per_image(key, p, g, im):
        k_e, k_r = jax.random.split(key)
        edges, thetas = sobel_edges(im[..., 0])  # red channel (getEdge :131)
        A, Bi = _edge_guided_pairs(k_e, edges, thetas, H, W, n_anchors, 2, 31)

        pf, gf = p.reshape(-1), g.reshape(-1)
        valid = gf > mask_value
        # random pairs over valid gt (randomSampling :18-40): the reference
        # draws sample_num random pairs against 3*sample_num EGS pairs
        # (:178-186), a 1:3 mixture in the combined mean
        ridx, _ = masked_sample(k_r, valid, 2 * n_anchors)
        rA, rB = ridx[0::2], ridx[1::2]
        A = jnp.concatenate([A, rA])
        Bi = jnp.concatenate([Bi, rB])

        iA, iB = pf[A], pf[Bi]
        tA, tB = gf[A], gf[Bi]
        mA = valid[A].astype(jnp.float32)
        mB = valid[Bi].astype(jnp.float32)
        consistency = mA * mB

        ratio = (tA + 1e-6) / (tB + 1e-6)
        mask_eq = (ratio < 1.0 + sigma) & (ratio > 1.0 / (1.0 + sigma))
        labels = jnp.where(ratio >= 1.0 + sigma, 1.0,
                           jnp.where(ratio <= 1.0 / (1.0 + sigma), -1.0, 0.0))

        equal_l = (iA - iB) ** 2 * mask_eq.astype(jnp.float32) * consistency
        # softplus == log(1 + exp(x)) but overflow-stable for large logits
        unequal_l = jax.nn.softplus((-iA + iB) * labels) * (
            1.0 - mask_eq.astype(jnp.float32)
        ) * consistency
        return alpha * jnp.mean(equal_l) + jnp.mean(unequal_l)

    keys = jax.random.split(key, B)
    return jax.vmap(per_image)(keys, pred, gt, rgb)


# ---------------------------------------------------------------------------
# Surface normals from depth
# ---------------------------------------------------------------------------


def _avg_pool3(x):
    """3x3 stride-1 avg pool, SAME zero padding (torch avg_pool2d padding=1
    counts the zeros in the denominator — count_include_pad default)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return s / 9.0


def depth_to_xyz(depth, focal_length):
    """(B, H, W, 1) depth → (B, H, W, 3) camera-frame points
    (Surface_normal.py:6-30): x=(u-W/2)d/f, y=(v-H/2)d/f, z=d."""
    B, H, W = depth.shape[:3]
    u = jnp.arange(W, dtype=jnp.float32)[None, None, :, None] - W / 2.0
    v = jnp.arange(H, dtype=jnp.float32)[None, :, None, None] - H / 2.0
    f = focal_length.reshape(-1, 1, 1, 1)
    return jnp.concatenate([u * depth / f, v * depth / f, depth], axis=-1)


def surface_normal_from_depth(depth, focal_length, valid_mask=None):
    """get_surface_normalv2 over avg-filtered depth (Surface_normal.py:95-213).
    depth: (B, H, W, 1); returns (B, H, W, 3) unit normals."""
    B, H, W = depth.shape[:3]
    d = _avg_pool3(_avg_pool3(depth))
    xyz = depth_to_xyz(d, focal_length)

    patch = 5
    half = patch // 2
    pad = jnp.zeros((B, H + patch - 1, W + patch - 1, 3), xyz.dtype)
    pad = pad.at[:, half:-half, half:-half, :].set(xyz)

    horiz = pad[:, half:half + H, :W, :] - pad[:, half:half + H, -W:, :]
    vert = pad[:, :H, half:half + W, :] - pad[:, -H:, half:half + W, :]
    horiz_in = pad[:, half:half + H, 1:W + 1, :] - pad[:, half:half + H, patch - 1:patch - 1 + W, :]
    vert_in = pad[:, 1:H + 1, half:half + W, :] - pad[:, patch - 1:patch - 1 + H, half:half + W, :]

    def orient(n):
        flip = jnp.sum(n * xyz, axis=-1, keepdims=True) > 0
        return jnp.where(flip, -n, n)

    unit = safe_normalize

    n1 = unit(orient(jnp.cross(horiz_in, vert_in)))
    n2 = unit(orient(jnp.cross(horiz, vert)))
    n = orient(unit(n1 + n2))
    if valid_mask is not None:
        n = jnp.where(valid_mask, n, 0.0)
    return n


# ---------------------------------------------------------------------------
# PWN edges — pairwise normal regression at image/normal edges
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _pair_cos(n_hwc, a, b):
    """|dot(n[a], n[b])| over (H, W, 3) normal-field rows at flat indices
    a, b — the differentiable gathers of pwn_edge_loss (PWN_edges.py
    :193-245). Row-gather FORWARD (one (n, 3) gather each; the channel-
    plane slice a plain gather avoids is a lane-unaligned relayout),
    per-channel scalar scatter-add BACKWARD (three (P,) scatter-adds
    instead of one (P, 3) row scatter-add). Same-session product-step
    A/B at B=20 448² bf16: full criterion 604.4 → 582.0 ms, edge-only
    438.4 → 420.5 ms (BASELINE.md round 4). Values match the naive
    formulation bitwise; gradients bitwise for collision-free indices
    and to f32 rounding when indices repeat (scatter accumulation
    order) — tests/test_prior.py
    ::test_pwn_edge_scalar_gather_matches_row_gather."""
    nf = n_hwc.reshape(-1, 3)
    return jnp.abs(jnp.sum(nf[a] * nf[b], -1))


def _pair_cos_fwd(n_hwc, a, b):
    nf = n_hwc.reshape(-1, 3)
    na, nb = nf[a], nf[b]
    s = jnp.sum(na * nb, -1)
    return jnp.abs(s), (na, nb, jnp.sign(s), a, b, n_hwc.shape)


def _pair_cos_bwd(res, gy):
    na, nb, sgn, a, b, shape = res
    g = gy * sgn
    planes = []
    for c in range(3):
        p = jnp.zeros((shape[0] * shape[1],), na.dtype)
        p = p.at[a].add(g * nb[:, c])
        p = p.at[b].add(g * na[:, c])
        planes.append(p)
    dn = jnp.stack(planes, -1).reshape(shape)
    return (dn,
            np.zeros(a.shape, jax.dtypes.float0),
            np.zeros(b.shape, jax.dtypes.float0))


_pair_cos.defvjp(_pair_cos_fwd, _pair_cos_bwd)


def pwn_edge_maps(im, n_g, g):
    """The deterministic edge maps of EdgeguidedNormalRegressionLoss.forward
    (PWN_edges.py:171-192) for ONE image: RGB sobel edges (getEdge :139-153,
    red channel), gt-normal-map edges (getNormalEdge :155-167 — mean over
    channels of per-channel |sobel| gradients, one conv call with the 3
    normal channels as batch and (kx, ky) as output features), the 5-px
    border zeroing of the normal edges (:183-185), and the dilated gt-depth
    edge mask zeroing both maps (:186-192). im: (H, W, 3) rgb; n_g: (H, W, 3)
    gt normals; g: (H, W, 1) gt depth. → (edges_img, thetas_img,
    edges_normal, thetas_normal), each (H, W). Golden-tested against the
    live reference in tests/test_prior_losses_golden.py."""
    H, W = im.shape[:2]
    edges_img, thetas_img = sobel_edges(im[..., 0])

    kx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    ky = jnp.asarray([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], jnp.float32)
    g_ch = jax.lax.conv_general_dilated(
        jnp.moveaxis(n_g, -1, 0)[..., None],  # (3, H, W, 1)
        jnp.stack([kx, ky], -1)[:, :, None, :],  # (3, 3, 1, 2)
        (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (3, H-2, W-2, 2)
    gxm = jnp.mean(jnp.abs(g_ch[..., 0]), axis=0)
    gym = jnp.mean(jnp.abs(g_ch[..., 1]), axis=0)
    edges_normal = jnp.pad(jnp.sqrt(gxm**2 + gym**2), ((1, 1), (1, 1)))
    thetas_normal = jnp.pad(jnp.arctan2(gym, gxm), ((1, 1), (1, 1)))

    # zero normal edges at image border (PWN_edges.py:183-185)
    border = jnp.ones((H, W), bool)
    border = border.at[5:-5, 5:-5].set(False)
    edges_normal = jnp.where(border, 0.0, edges_normal)

    # dilated gt-depth edges mask zeroes both edge maps (:186-192)
    edges_depth, _ = sobel_edges(g[..., 0])
    depth_edge_mask = edges_depth >= 0.1 * jnp.max(edges_depth)
    dil = jax.lax.reduce_window(
        depth_edge_mask.astype(jnp.float32), 0.0, jax.lax.add,
        (3, 3), (1, 1), [(1, 1), (1, 1)],
    )
    dil = jnp.clip(dil, 0, 1) > 0
    edges_normal = jnp.where(dil, 0.0, edges_normal)
    edges_img = jnp.where(dil, 0.0, edges_img)
    return edges_img, thetas_img, edges_normal, thetas_normal


def pwn_edge_loss(key, pred_ss, gt, rgb, focal_length, mask_value=-1e-8,
                  cos_theta1=0.3, cos_theta2=0.95, n_anchors: int = 3000):
    """EdgeguidedNormalRegressionLoss (PWN_edges.py:104-245): normals from
    (scale/shift-aligned) pred and gt depth; pairs sampled at RGB edges and
    normal edges (distances 3-19); |cos| regression on nearly-parallel and
    nearly-orthogonal gt pairs, plus a random-pair regression term.
    Implements the evident per-image intent (see module docstring). → (B,)."""
    B, H, W = pred_ss.shape[:3]
    masks = gt > mask_value
    # SCADE_SN_REMAT: rematerialize the pred-normal forward in its backward
    # (the ~18 (B,H,W,3) shift/cross/normalize temporaries otherwise persist
    # from forward to backward; recomputing them is pure VPU work). The
    # gt-side normals take no gradient, so only the pred side is wrapped.
    import os as _os

    sn = (jax.checkpoint(surface_normal_from_depth)
          if _os.environ.get("SCADE_SN_REMAT", "0") != "0"
          else surface_normal_from_depth)
    normals_pred = sn(pred_ss, focal_length, masks)
    normals_gt = surface_normal_from_depth(gt, focal_length, masks)

    def per_image(key, n_p, n_g, im, g):
        k1, k2, k3 = jax.random.split(key, 3)
        edges_img, thetas_img, edges_normal, thetas_normal = pwn_edge_maps(
            im, n_g, g)

        A1, B1 = _edge_guided_pairs(k1, edges_img, thetas_img, H, W, n_anchors, 3, 20)
        A2, B2 = _edge_guided_pairs(k2, edges_normal, thetas_normal, H, W, n_anchors, 3, 20)
        A = jnp.concatenate([A1, A2])
        Bi = jnp.concatenate([B1, B2])

        ng_f = n_g.reshape(-1, 3)
        m_f = g.reshape(-1) > mask_value

        # The pred-normal gathers are the only differentiable ones; _pair_cos
        # keeps the cheap row-gather forward but routes the backward through
        # per-channel scalar scatter-adds (see its docstring).
        cons = (m_f[A] & m_f[Bi]).astype(jnp.float32)
        t_cos = jnp.abs(jnp.sum(ng_f[A] * ng_f[Bi], -1))
        i_cos = _pair_cos(n_p, A, Bi)

        m75 = (t_cos < cos_theta1).astype(jnp.float32) * cons
        m10 = (t_cos > cos_theta2).astype(jnp.float32) * cons
        l75 = jnp.sum(jnp.abs(t_cos - i_cos) * m75) / (jnp.sum(m75) + 1e-8)
        l10 = jnp.sum(jnp.abs(t_cos - i_cos) * m10) / (jnp.sum(m10) + 1e-8)

        # random normal pairs over valid pixels (randomSamplingNormal :18-36)
        ridx, _ = masked_sample(k3, m_f, 4 * n_anchors)
        rA, rB = ridx[0::2], ridx[1::2]
        rt = jnp.abs(jnp.sum(ng_f[rA] * ng_f[rB], -1))
        ri = _pair_cos(n_p, rA, rB)
        l_rand = jnp.mean(jnp.abs(rt - ri))
        return l75 + l10 + l_rand

    keys = jax.random.split(key, B)
    return jax.vmap(per_image)(keys, normals_pred, normals_gt, rgb, gt)


# ---------------------------------------------------------------------------
# PWN planes — virtual-normal consistency within plane instances
# ---------------------------------------------------------------------------


def pwn_planes_loss(key, gt_depth, pred_depth, planes_mask, focal_length,
                    sample_groups: int = 5000, max_planes: int = 8,
                    delta_cos=0.867, delta_diff=0.007, impl=None):
    """PWNPlanesLoss (PWN_planes.py:6-250): sample 3-point groups inside each
    plane instance, compute virtual normals, penalize deviation from the
    plane's mean normal. planes_mask: (B, H, W) int instance ids (0 = none).
    Static shapes: up to max_planes instances per image, sample_groups
    groups per plane. → (B,).

    impl selects the per-plane sampling lowering (None → the
    SCADE_PWN_PLANES env var, default "perm"); both are bit-identical
    (tests/test_prior.py::test_pwn_planes_perm_matches_cdf):

    - "perm": ONE stable argsort per image orders pixels by plane id
      (ties: ascending pixel index), so plane k's rank-r valid pixel is
      perm[offset_k + r] and a draw is floor(u) index math + one scalar
      gather — the 8 per-plane mask CDFs + bucketed searches collapse
      into a shared partition. Chip probe (tools/probe_perm_build.py,
      B=20, 8 planes, 15000 draws, P=448²): 29.1 ms vs 48.7 ms for the
      masked_sample path (a scatter-set counting sort loses at 136 ms —
      TPU sort is cheap, pointwise scatter construction is not).
    - "cdf": 8 independent masked_sample calls (kept as the reference
      lowering for the deterministic-sampling golden,
      tests/test_prior_losses_golden.py::test_pwn_planes_parity).
    """
    B, H, W = pred_depth.shape[:3]
    P = H * W
    n = 3 * sample_groups
    if impl is None:
        impl = os.environ.get("SCADE_PWN_PLANES", "perm")

    def per_image(key, pred, planes, f):
        # two coordinate systems, as in the reference (select_points_groups
        # :167-183): the degenerate-group filter ALWAYS runs on normalized
        # image coordinates (transfer_uvz :51-59 — u,v pixel offsets over
        # max_uv, where delta_diff=0.007 ≈ 1.6 px at 448²), while the
        # virtual normals use camera-frame xyz with |depth| in x/y
        # (transfer_xyz :61-67 — abs keeps the lateral sign fixed when the
        # scale/shift-aligned depth goes negative).
        #
        # Neither coordinate field is materialized: only the depth SCALAR
        # is gathered at the sampled pixels and u,v are recomputed from the
        # flat index — the camera transforms are elementwise, so this is
        # bit-identical to gathering precomputed (P, 3) uvz/xyz fields
        # while cutting the gather (and its backward scatter-add, the
        # dominant cost of this loss's gradient) from 3-vectors to scalars
        # and skipping the uv gather entirely.
        max_uv = jnp.float32(W - 1 - W // 2)
        pred_flat = pred.reshape(-1)
        planes_flat = planes.reshape(-1)
        keys = jax.random.split(key, max_planes)

        if impl == "perm":
            pf = jnp.where(
                (planes_flat < 0) | (planes_flat > max_planes), 0, planes_flat)
            perm = jnp.argsort(pf, stable=True).astype(jnp.int32)
            counts = jnp.sum(
                pf[:, None] == jnp.arange(max_planes + 1, dtype=pf.dtype),
                axis=0)
            offsets = jnp.cumsum(counts) - counts  # exclusive, (K+1,)

            def sample_plane(plane_key, j):
                cnt = counts[j + 1]
                # same RNG stream as masked_sample, and floor(u) IS the
                # searchsorted(cdf, u, 'right') rank (the mask CDF's values
                # are exact f32 integers for P < 2^24), so idx reproduces
                # the cdf impl bit-for-bit — including the u==total →
                # last-pixel clip law and the empty-plane → P-1 law
                u = jax.random.uniform(plane_key, (n,)) * jnp.maximum(
                    cnt.astype(jnp.float32), 1.0)
                r = u.astype(jnp.int32)
                pos = offsets[j + 1] + jnp.clip(r, 0, jnp.maximum(cnt - 1, 0))
                idx = jnp.where(
                    r >= cnt, P - 1, perm[jnp.minimum(pos, P - 1)])
                return idx, cnt

            idx_all, n_valid_all = jax.vmap(sample_plane)(
                keys, jnp.arange(max_planes))
        else:

            def sample_plane(plane_key, plane_id):
                mask = (planes_flat == plane_id) & (plane_id > 0)
                idx, _ = masked_sample(plane_key, mask, n)
                return idx, jnp.sum(mask)

            idx_all, n_valid_all = jax.vmap(sample_plane)(
                keys, jnp.arange(1, max_planes + 1))

        # ONE flat differentiable gather for all planes; its VJP is one flat
        # (max_planes*n,) scalar scatter-add per image — the winning shape
        # in tools/probe_scatter_pwn.py
        z_all = pred_flat[idx_all.reshape(-1)].reshape(max_planes, n)

        def per_plane(idx, z, n_valid):
            # Structure-of-arrays throughout: every (N, 3)/(N, 3, 2)
            # small-trailing-dim tensor of the naive formulation puts 3 (or
            # 2) elements on the 128-wide TPU lane dim — <3% lane
            # occupancy on every vector op and a lane-padded einsum for the
            # filter. Unrolling the coordinates into separate (N,) planes
            # keeps every op lane-dense. Per-component arithmetic uses the
            # same operand order as the vector forms (cross/cosine/norm
            # expansions written left-to-right), so values match the
            # stacked formulation to f32 rounding of the N-axis reductions.
            i1, i2, i3 = idx[0::3], idx[1::3], idx[2::3]
            z1, z2, z3 = z[0::3], z[1::3], z[2::3]

            def cam(i, zz):
                uu = (i % W).astype(jnp.float32) - W // 2
                vv = (i // W).astype(jnp.float32) - H // 2
                return uu, vv, uu * jnp.abs(zz) / f, vv * jnp.abs(zz) / f

            u1, v1, x1, y1 = cam(i1, z1)
            u2, v2, x2, y2 = cam(i2, z2)
            u3, v3, x3, y3 = cam(i3, z3)
            # validity: plane has enough support — the reference drops any
            # plane with < 0.6*select_size valid pixels (select_index
            # :82-85, valid_batch=False)
            plane_ok = n_valid >= 0.6 * (3 * sample_groups)

            # degenerate-triangle filter (filter_mask :140-166) on the
            # normalized uv coords: reject near-collinear (cos > delta) or
            # near-coincident groups. Pure index math — z drops out of the
            # reference's filter too (it slices [:, :2]).
            dx = (
                (u2 - u1) / max_uv, (u3 - u1) / max_uv, (u3 - u2) / max_uv)
            dy = (
                (v2 - v1) / max_uv, (v3 - v1) / max_uv, (v3 - v2) / max_uv)
            norms = [
                jnp.sqrt(dx[i] ** 2 + dy[i] ** 2) + 1e-8 for i in range(3)]
            n_bad = 0
            for i in range(3):
                for j in range(3):
                    cos_ij = (dx[i] * dx[j] + dy[i] * dy[j]) / (
                        norms[i] * norms[j])
                    n_bad = n_bad + (
                        (cos_ij > delta_cos) | (cos_ij < -delta_cos)
                    ).astype(jnp.int32)
            mask_cos = n_bad > 3
            near = (
                (jnp.abs(dx[0]) < delta_diff)
                | (jnp.abs(dx[1]) < delta_diff)
                | (jnp.abs(dx[2]) < delta_diff)
            ) & (
                (jnp.abs(dy[0]) < delta_diff)
                | (jnp.abs(dy[1]) < delta_diff)
                | (jnp.abs(dy[2]) < delta_diff)
            )
            group_ok = (~(mask_cos | near)) & plane_ok

            # virtual normal: cross(p2-p1, p3-p1), unit-normalized, oriented
            # away from p1 (same component expansions as jnp.cross /
            # safe_normalize)
            ax, ay, az = x2 - x1, y2 - y1, z2 - z1
            bx, by, bz = x3 - x1, y3 - y1, z3 - z1
            cx = ay * bz - az * by
            cy = az * bx - ax * bz
            cz = ax * by - ay * bx
            inv = jax.lax.rsqrt(cx**2 + cy**2 + cz**2 + 1e-12)
            vx, vy, vz = cx * inv, cy * inv, cz * inv
            flip = vx * x1 + vy * y1 + vz * z1 > 0
            vx = jnp.where(flip, -vx, vx)
            vy = jnp.where(flip, -vy, vy)
            vz = jnp.where(flip, -vz, vz)

            w = group_ok.astype(jnp.float32)
            sx, sy, sz = (
                jnp.sum(vx * w), jnp.sum(vy * w), jnp.sum(vz * w))
            s_inv = jax.lax.rsqrt(sx**2 + sy**2 + sz**2 + 1e-10)
            avx, avy, avz = sx * s_inv, sy * s_inv, sz * s_inv
            cos_diff = jnp.where(
                group_ok, 1.0 - (vx * avx + vy * avy + vz * avz), 0.0)
            # a plane with < 2 surviving groups contributes NOTHING — not
            # even to the global denominator (constrain_a_plane_loss
            # :189-190 returns [0.0, 0])
            keep = jnp.sum(group_ok) >= 2
            return (
                jnp.where(keep, jnp.sum(cos_diff), 0.0),
                jnp.where(keep, jnp.sum(w), 0.0),
            )

        losses, cnts = jax.vmap(per_plane)(idx_all, z_all, n_valid_all)
        return jnp.sum(losses), jnp.sum(cnts)

    keys = jax.random.split(key, B)
    losses, counts = jax.vmap(per_image)(keys, pred_depth, planes_mask, focal_length)
    return losses / (jnp.sum(counts) + 1e-8)


# ---------------------------------------------------------------------------
# closed-form scale/shift alignment + criterion
# ---------------------------------------------------------------------------


def recover_scale_shift_depth(pred, gt, min_threshold=-1e-8, max_threshold=10.1):
    """Per-image closed-form 2x2 LSQ of pred→gt over valid pixels
    (multi_depth_model_auxiv2.py:550-575). pred/gt: (B, H, W, 1)."""
    B = pred.shape[0]
    mask = ((gt > min_threshold) & (gt < max_threshold)).astype(pred.dtype)
    p = pred.reshape(B, -1)
    g = gt.reshape(B, -1)
    m = mask.reshape(B, -1)

    a00 = jnp.sum(m * p * p, 1) + 1e-6
    a01 = jnp.sum(m * p, 1)
    a11 = jnp.sum(m, 1) + 1e-6
    b0 = jnp.sum(m * p * g, 1)
    b1 = jnp.sum(m * g, 1)
    det = a00 * a11 - a01 * a01
    safe = jnp.where(det != 0, det, 1.0)
    scale = (a11 * b0 - a01 * b1) / safe
    shift = (-a01 * b0 + a00 * b1) / safe
    return pred * scale[:, None, None, None] + shift[:, None, None, None]


def criterion(key, pred_depth, batch, loss_mode: str):
    """ModelLoss.decoder_loss (multi_depth_model_auxiv2.py:209-341): assemble
    the active losses by substring match on loss_mode. batch: dict with
    'depth' (B,H,W,1), 'rgb' (B,H,W,3), 'planes' (B,H,W) int,
    'focal_length' (B,), 'quality_flg' (B,). Returns (loss_dict,
    per_image_total (B,))."""
    k_rank, k_edge, k_plane = jax.random.split(key, 3)
    gt = batch["depth"]
    B = gt.shape[0]
    total = jnp.zeros((B,), jnp.float32)
    loss = {}
    lm = loss_mode.lower()

    mid_q = (batch["quality_flg"] >= 2).astype(jnp.float32)
    high_q = (batch["quality_flg"] == 3).astype(jnp.float32)

    needs_ss = ("_pairwise-normal-regress-edge_" in lm
                or "_pairwise-normal-regress-plane_" in lm)
    pred_ss = recover_scale_shift_depth(pred_depth, gt) if needs_ss else None

    if "_pairwise-normal-regress-plane_" in lm:
        cur = pwn_planes_loss(
            k_plane, gt, pred_ss, batch["planes"], batch["focal_length"]
        )
        loss["pairwise-normal-regress-plane_loss"] = jnp.sum(cur)
        total = total + cur

    if "_pairwise-normal-regress-edge_" in lm:
        cur = pwn_edge_loss(
            k_edge, pred_ss, gt, batch["rgb"], batch["focal_length"]
        ) * high_q  # only quality==3 images (:300-310)
        loss["pairwise-normal-regress-edge_loss"] = jnp.sum(cur)
        total = total + cur

    if "_meanstd-tanh_" in lm:
        cur = ilnr_loss(pred_depth, gt) * mid_q  # quality>=2 (:262-270)
        loss["meanstd-tanh_loss"] = jnp.sum(cur)
        total = total + cur

    if "_ranking-edge_" in lm:
        cur = ranking_edge_loss(k_rank, pred_depth, gt, batch["rgb"])
        loss["ranking-edge_loss"] = jnp.sum(cur)
        total = total + cur

    if "_msgil-normal_" in lm:
        cur = msgil_loss(pred_depth, gt) * 0.1
        loss["msg_normal_loss"] = jnp.sum(cur)
        total = total + cur

    loss["total_loss"] = sum(loss.values()) if loss else jnp.zeros((), jnp.float32)
    return loss, total


def auxi_criterion(key, pred_disp, batch, loss_mode: str,
                   auxi_weight: float = 0.5):
    """ModelLoss.auxi_loss for the disparity branch
    (multi_depth_model_auxiv2.py:229-248): the *-auxi_ substring losses on
    pred vs batch['disp'], total scaled by LOSS_AUXI_WEIGHT (config.py:99).
    Returns (loss_dict, per_image_total (B,))."""
    if "disp" not in batch:
        z = jnp.zeros((), jnp.float32)
        return {"total_loss": z}, jnp.zeros((pred_disp.shape[0],), jnp.float32)
    gt = batch["disp"]
    B = gt.shape[0]
    lm = loss_mode.lower()
    loss = {}
    total = jnp.zeros((B,), jnp.float32)
    if "_ranking-edge-auxi_" in lm:
        cur = ranking_edge_loss(key, pred_disp, gt, batch["rgb"])
        loss["ranking-edge_auxiloss"] = jnp.sum(cur)
        total = total + cur
    if "_msgil-normal-auxi_" in lm:
        cur = msgil_loss(pred_disp, gt) * 0.5
        loss["msg_normal_auxiloss"] = jnp.sum(cur)
        total = total + cur
    if "_meanstd-tanh-auxi_" in lm:
        cur = ilnr_loss(pred_disp, gt)
        loss["meanstd-tanh_auxiloss"] = jnp.sum(cur)
        total = total + cur
    total = total * auxi_weight
    loss["total_loss"] = sum(v for k, v in loss.items() if k != "total_loss") * auxi_weight \
        if loss else jnp.zeros((), jnp.float32)
    return loss, total
