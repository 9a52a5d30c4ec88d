"""Hierarchical inverse-CDF sampling (NeRF section 5.2, SCADE P_depth draws).

Semantics match the reference family sample_pdf / sample_pdf_joint /
*_return_u (reference: model/run_nerf_helpers.py:337-538): weights get a
1e-5 floor, the CDF is prepended with 0, ``searchsorted(..., right=True)``
locates each uniform draw, and a ``denom < 1e-5`` guard protects the final
linear interpolation.

Design notes (TPU-first):

- All four reference variants collapse into ONE pure function taking the
  uniform draws ``u`` explicitly; joint-vs-independent and cached-u are just
  different ways of producing ``u`` (see ``draw_u``). This keeps the hot op
  free of RNG state and makes the SCADE "cached_u" mechanism trivial.
- ``searchsorted(right=True)`` is computed as a broadcasted comparison sum
  instead of a per-row binary search: with S draws and M bins per ray the
  (S, M) bool matrix is tiny and maps onto the VPU as one fused reduction —
  no gather-scatter, no vmap of a sequential search.
- The function is differentiable w.r.t. ``weights`` (through the CDF and
  interpolation); SCADE's space-carving loss backprops through these samples.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def draw_u(key, n_rays: int, n_samples: int, det: bool = False, joint: bool = False):
    """Uniform draws for sample_pdf.

    det:   deterministic linspace(0, 1) per ray (test-time rendering).
    joint: ONE shared draw vector broadcast to all rays (SCADE is_joint mode,
           reference run_nerf_helpers.py:452-453).
    """
    if det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32)
        return jnp.broadcast_to(u, (n_rays, n_samples))
    if joint:
        u = jax.random.uniform(key, (n_samples,), dtype=jnp.float32)
        return jnp.broadcast_to(u, (n_rays, n_samples))
    return jax.random.uniform(key, (n_rays, n_samples), dtype=jnp.float32)


def draw_u_sorted(key, n_rays: int, n_samples: int, det: bool = False,
                  joint: bool = False):
    """Per-ray ASCENDING uniform draws with the exact joint distribution of
    the order statistics of ``n_samples`` iid U(0,1) variables.

    Generated in O(S) via normalized cumulative sums of S+1 iid Exp(1)
    spacings — no sort. Because every consumer of the importance draws in
    SCADE is order-invariant (the fine z's are merged into a sorted union,
    the P_depth set feeds min/mean reductions), swapping iid draws for their
    order statistics leaves training dynamics distributionally identical
    while making the fine-pass z-merge O(S) instead of an O(S log^2 S) sort
    (see render/renderer.py, PARITY.md §known deviations).
    """
    if det:
        return draw_u(key, n_rays, n_samples, det=True)
    rows = 1 if joint else n_rays
    e = jax.random.exponential(key, (rows, n_samples + 1), dtype=jnp.float32)
    c = jnp.cumsum(e, axis=-1)
    u = c[..., :-1] / c[..., -1:]
    return jnp.broadcast_to(u, (n_rays, n_samples)) if joint else u


def merge_sorted(a, b, va=None, vb=None):
    """Merge two per-ray ASCENDING arrays into one sorted union — the
    O(Na*Nb) compare + one-hot-matmul replacement for
    ``sort(concat([a, b]))`` of two already-sorted sequences (the reference
    sorts the full union every fine pass, run_scade_scannet.py:678-683).

    a: (..., Na), b: (..., Nb). Optionally carries per-sample payloads
    va: (..., Na, C) / vb: (..., Nb, C) through the same permutation.
    Returns merged (..., Na+Nb) [, merged payload (..., Na+Nb, C)].

    The merged rank of a[i] is i + |{j : b[j] < a[i]}| and of b[j] is
    j + |{i : a[i] <= b[j]}| (ties: a first — matching stable concat order);
    the two rank sets are disjoint and cover 0..S-1, so a one-hot
    scatter-by-matmul places every element exactly once. The matmuls are
    a few hundred MFLOP per tile — noise next to the NeRF MLP — and map to
    the MXU, whereas XLA's variadic sort runs on the (slow) scalar path.
    """
    na, nb = a.shape[-1], b.shape[-1]
    s = na + nb
    ra = jnp.arange(na, dtype=jnp.int32) + jnp.sum(
        (b[..., None, :] < a[..., :, None]).astype(jnp.int32), axis=-1
    )
    rb = jnp.arange(nb, dtype=jnp.int32) + jnp.sum(
        (a[..., None, :] <= b[..., :, None]).astype(jnp.int32), axis=-1
    )
    ks = jnp.arange(s, dtype=jnp.int32)
    oa = (ra[..., :, None] == ks).astype(a.dtype)  # (..., Na, S)
    ob = (rb[..., :, None] == ks).astype(b.dtype)  # (..., Nb, S)
    # precision=HIGHEST: one-hot selection must pass f32 values through
    # exactly — TPU DEFAULT precision would truncate the z/payload operand
    # to bf16 on the MXU, quantizing sample positions (same requirement as
    # sample_pdf_onehot below)
    hp = jax.lax.Precision.HIGHEST
    merged = jnp.einsum("...is,...i->...s", oa, a, precision=hp) + jnp.einsum(
        "...js,...j->...s", ob, b, precision=hp
    )
    if va is None:
        return merged
    vals = jnp.einsum(
        "...is,...ic->...sc", oa.astype(va.dtype), va, precision=hp
    ) + jnp.einsum("...js,...jc->...sc", ob.astype(vb.dtype), vb, precision=hp)
    return merged, vals


def _cdf_from_weights(weights):
    weights = weights + 1e-5  # prevent nans (reference :339)
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    return jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)


def _interp(u, cdf_below, cdf_above, bins_below, bins_above):
    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def sample_pdf_masked(bins, weights, u):
    """Masked-reduction inverse CDF (the round-2 gather-free form).

    Exploits that BOTH cdf and bins are ascending:
      x[inds-1] = max_m { x[m] : cdf[m] <= u }        ("below")
      x[min(inds, M-1)] = min_m { x[m] : cdf[m] > u } (filler x[-1] ⇒ clip)
    Each lookup is one fused compare+select+reduce over the (S, M) tile on
    the VPU; values are BIT-IDENTICAL to the searchsorted+gather ones.
    le[..., 0] is always True (cdf[0] = 0 <= u), so the "below" reductions
    never see an empty mask.
    """
    return _lookup_masked(bins, _cdf_from_weights(weights), u)


def sample_pdf_onehot(bins, weights, u):
    """One-hot-matmul inverse CDF — same values as ``sample_pdf_masked``,
    restructured for the MXU and for cheap reverse-mode autodiff.

    The masked form materializes ~8 (S, M) float tensors (4 where-selects +
    their reduce inputs); its autodiff builds several more (max/min VJPs
    re-broadcast equality masks). Here the "below" element (the LAST true
    position of the ascending compare row) and "above" element (first false,
    clipped to M-1) become explicit one-hot rows built from the single bool
    tile, and the 4 lookups collapse into 2 batched (S, M) @ (M, 2) matmuls
    on the MXU. Selecting one f32 value through a one-hot is exact at
    precision HIGH/HIGHEST (the bf16x3 split of a value times an exact 1.0
    reconstructs the value bitwise), so outputs stay bit-identical. The
    backward w.r.t. cdf/bins is just the transposed matmuls — no (S, M)
    equality-mask reconstruction — which matters for SCADE's P_depth draws
    (the space-carving loss backprops through this op; reference
    run_scade_scannet.py:726-730).
    """
    cdf = _cdf_from_weights(weights)
    le = cdf[..., None, :] <= u[..., :, None]  # (..., S, M)
    # last-true = le[m] & ~le[m+1] (pad: column M-1 stays set iff all true)
    le_next = jnp.concatenate(
        [le[..., 1:], jnp.zeros_like(le[..., :1])], axis=-1
    )
    below = jnp.logical_and(le, jnp.logical_not(le_next))
    # first-false = ~le[m] & le[m-1]; if the row is all true, select M-1
    # (the searchsorted clip min(inds, M-1) — both lookups then coincide)
    le_prev = jnp.concatenate(
        [jnp.ones_like(le[..., :1]), le[..., :-1]], axis=-1
    )
    above = jnp.logical_and(jnp.logical_not(le), le_prev)
    above = above.at[..., -1].set(
        jnp.logical_or(above[..., -1], le[..., -1])
    )

    vals = jnp.stack([cdf, bins], axis=-1)  # (..., M, 2)
    f = jnp.float32
    lo = jnp.einsum(
        "...sm,...mc->...sc", below.astype(f), vals,
        precision=jax.lax.Precision.HIGHEST,
    )
    hi = jnp.einsum(
        "...sm,...mc->...sc", above.astype(f), vals,
        precision=jax.lax.Precision.HIGHEST,
    )
    return _interp(u, lo[..., 0], hi[..., 0], lo[..., 1], hi[..., 1])


def sample_pdf_bucketed(bins, weights, u, bucket: int = 16):
    """Two-level (bucketed) inverse CDF — same values as
    ``sample_pdf_masked``, with the O(S·M) compare tile split-factored.

    Level 1 ranks each draw against the G = ceil(M/bucket) bucket-leading
    CDF values (an (S, G) compare) and one-hot-selects that bucket's
    2·bucket-wide window [bucket g, bucket g+1] of cdf/bins values via two
    MXU matmuls (exact f32 pass-through at precision HIGHEST). Level 2
    runs the masked compare+select+reduce on the (S, 2·bucket) window
    instead of the full (S, M) tile. For SCADE's P_depth site (M = 191,
    reference run_scade_scannet.py:726-730) this cuts the VPU tile from
    191 lanes-columns to 32.

    Why the window provably contains both lookups: with g* = the last
    bucket whose leading cdf is <= u, every element of later buckets
    exceeds u (ascending), so the global last-true position p lies in
    bucket g*, and the first-false position p+1 lies in g* or g*+1.
    Padding uses FINITE sentinels (cdf 2.0 > any u; bins: the last real
    bin) because one-hot matmuls NaN-poison on 0·inf; sentinel entries
    compare false and lose every min/max against real candidates, and the
    all-true fallback row resolves to the same cdf_last/bins_last fill as
    the masked form. Values are bit-identical (pinned by tests); falls
    back to ``sample_pdf_masked`` when M <= 2·bucket (no tile to save).
    """
    cdf = _cdf_from_weights(weights)
    m = cdf.shape[-1]
    if m <= 2 * bucket:
        return _lookup_masked(bins, cdf, u)
    g = -(-m // bucket)
    mp = g * bucket
    pad = mp + bucket - m
    lead = cdf.shape[:-1]
    cdf_last = cdf[..., -1:]
    bins_last = bins[..., -1:]
    cdf_p = jnp.concatenate(
        [cdf, jnp.full(lead + (pad,), 2.0, cdf.dtype)], axis=-1
    )
    bins_p = jnp.concatenate(
        [bins, jnp.broadcast_to(bins_last, lead + (pad,))], axis=-1
    )

    def windows(xp):
        a = xp[..., :mp].reshape(lead + (g, bucket))
        b = xp[..., bucket:mp + bucket].reshape(lead + (g, bucket))
        return jnp.concatenate([a, b], axis=-1)  # (..., G, 2B)

    cw = windows(cdf_p)
    bw = windows(bins_p)
    first = cw[..., :, 0]  # (..., G) leading cdf of each bucket
    # rank in [0, G-1]: first[0] = cdf[0] = 0 <= u always
    rank = jnp.sum(
        (first[..., None, :] <= u[..., :, None]).astype(jnp.int32), axis=-1
    ) - 1
    onehot = (rank[..., :, None] == jnp.arange(g, dtype=jnp.int32)).astype(
        cdf.dtype
    )  # (..., S, G)
    hp = jax.lax.Precision.HIGHEST
    sel_cdf = jnp.einsum("...sg,...gk->...sk", onehot, cw, precision=hp)
    sel_bins = jnp.einsum("...sg,...gk->...sk", onehot, bw, precision=hp)

    le = sel_cdf <= u[..., :, None]  # (..., S, 2B)
    neg = jnp.float32(-jnp.inf)
    cdf_below = jnp.max(jnp.where(le, sel_cdf, neg), axis=-1)
    bins_below = jnp.max(jnp.where(le, sel_bins, neg), axis=-1)
    cdf_above = jnp.min(
        jnp.where(le, jnp.broadcast_to(cdf_last[..., None, :], le.shape),
                  sel_cdf),
        axis=-1,
    )
    bins_above = jnp.min(
        jnp.where(le, jnp.broadcast_to(bins_last[..., None, :], le.shape),
                  sel_bins),
        axis=-1,
    )
    return _interp(u, cdf_below, cdf_above, bins_below, bins_above)


def _lookup_masked(bins, cdf, u):
    """sample_pdf_masked's body from a precomputed cdf (shared by the
    bucketed fallback so the CDF isn't built twice)."""
    le = cdf[..., None, :] <= u[..., :, None]
    cdf_b = jnp.broadcast_to(cdf[..., None, :], le.shape)
    bins_b = jnp.broadcast_to(bins[..., None, :], le.shape)
    neg = jnp.float32(-jnp.inf)
    cdf_below = jnp.max(jnp.where(le, cdf_b, neg), axis=-1)
    bins_below = jnp.max(jnp.where(le, bins_b, neg), axis=-1)
    cdf_above = jnp.min(
        jnp.where(le, jnp.broadcast_to(cdf[..., None, -1:], le.shape), cdf_b),
        axis=-1,
    )
    bins_above = jnp.min(
        jnp.where(le, jnp.broadcast_to(bins[..., None, -1:], le.shape), bins_b),
        axis=-1,
    )
    return _interp(u, cdf_below, cdf_above, bins_below, bins_above)


# The default implementation used by the renderer; SCADE_SAMPLE_PDF flips
# it for A/B profiling. Measured on-chip (BASELINE.md r3): all forms are
# within noise at train scale (sample_pdf bwd is ~0.1 ms of the 22.8 ms
# step). At full-render scale the standalone probes split BY SITE
# (/tmp/r3_pending.log, chained-scan slope): at the importance site
# (M=63) masked wins 6.0 ms vs bucketed 13.3 ms, while at the P_depth
# site (M=191) bucketed wins 15.3 ms vs masked 26.7 ms — its level-2
# reduce touches a (S, 32) window instead of the full (S, M) tile, a
# saving that only pays once M is well past 2*bucket. The "auto" default
# therefore picks PER CALL SITE by the static bin count (masked at
# M <= _AUTO_THRESHOLD, bucketed above); the round-3 global-bucketed
# bench (218.3k rays/s) banked only the P_depth win and paid the
# importance-site loss. The one-hot MXU form loses clearly everywhere
# at render scale (183k — its one-hot operands must hit HBM, ~1.6 GB
# per 8192-ray chunk). All three lowerings produce bit-identical VALUES
# (tests/test_parity_ops.py::test_sample_pdf_bucketed_bit_identical);
# gradients are equal up to subgradient tie choice at exact cdf ties
# (allclose-tested, rtol=2e-5).
import os as _os

_AUTO_THRESHOLD = 128


def sample_pdf_auto(bins, weights, u):
    """Per-site lowering: masked below M = _AUTO_THRESHOLD bins, bucketed
    above. The bin count is static at trace time, so this is a free
    Python-level choice inside jit (one lowering per call site)."""
    if bins.shape[-1] <= _AUTO_THRESHOLD:
        return sample_pdf_masked(bins, weights, u)
    return sample_pdf_bucketed(bins, weights, u)


_IMPLS = {
    "masked": sample_pdf_masked,
    "onehot": sample_pdf_onehot,
    "bucketed": sample_pdf_bucketed,
    "auto": sample_pdf_auto,
}
_ENV_IMPL = _os.environ.get("SCADE_SAMPLE_PDF", "auto")
if _ENV_IMPL not in _IMPLS:
    raise ValueError(
        f"SCADE_SAMPLE_PDF={_ENV_IMPL!r}: expected one of {sorted(_IMPLS)}"
    )
_DEFAULT_IMPL = _IMPLS[_ENV_IMPL]


def sample_pdf(bins, weights, u):
    """Inverse-CDF sampling of ``u`` from the histogram (bins, weights).

    bins:    (..., M) sorted bin positions (z_vals midpoints).
    weights: (..., M-1) unnormalized probabilities per bin interval.
    u:       (..., S) uniform draws in [0, 1) (see ``draw_u``).
    Returns  (..., S) samples. Semantics match the reference sample_pdf
    family (run_nerf_helpers.py:337-538) bit-for-bit. Three TPU lowerings
    produce identical values: ``sample_pdf_masked`` (full-tile VPU
    compare+reduce), ``sample_pdf_onehot`` (one-hot MXU matmuls), and
    ``sample_pdf_bucketed`` (two-level windowed CDF). The default picks
    per call site by static bin count (``sample_pdf_auto``); set
    SCADE_SAMPLE_PDF=masked|onehot|bucketed|auto to override globally.
    """
    return _DEFAULT_IMPL(bins, weights, u)


# ---------------------------------------------------------------------------
# Reference-parity wrappers. Each maps one of the four reference entry points
# onto the single pure core above.
# ---------------------------------------------------------------------------


def sample_pdf_return_u(bins, weights, n_samples: int, key=None, det=False, load_u=None):
    """reference sample_pdf_return_u (run_nerf_helpers.py:385-436)."""
    if load_u is None:
        u = draw_u(key, bins.shape[0], n_samples, det=det, joint=False)
    else:
        u = load_u
    return sample_pdf(bins, weights, u), u


def sample_pdf_joint(bins, weights, n_samples: int, key=None, det=False):
    """reference sample_pdf_joint (run_nerf_helpers.py:439-486)."""
    u = draw_u(key, bins.shape[0], n_samples, det=det, joint=True)
    return sample_pdf(bins, weights, u)


def sample_pdf_joint_return_u(bins, weights, n_samples: int, key=None, det=False, load_u=None):
    """reference sample_pdf_joint_return_u (run_nerf_helpers.py:488-538)."""
    if load_u is None:
        u = draw_u(key, bins.shape[0], n_samples, det=det, joint=True)
    else:
        u = load_u
    return sample_pdf(bins, weights, u), u
