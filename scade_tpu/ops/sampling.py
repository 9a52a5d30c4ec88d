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


def _searchsorted_right(cdf, u):
    """Index i per draw s.t. cdf[i-1] <= u < cdf[i], vectorized over rays.

    cdf: (..., M) nondecreasing; u: (..., S) → (..., S) int32.
    Equivalent to torch.searchsorted(cdf, u, right=True): the insertion index
    is the count of cdf entries <= u.
    """
    return jnp.sum(
        (cdf[..., None, :] <= u[..., :, None]).astype(jnp.int32), axis=-1
    )


def sample_pdf(bins, weights, u):
    """Inverse-CDF sampling of ``u`` from the histogram (bins, weights).

    bins:    (..., M) sorted bin positions (z_vals midpoints).
    weights: (..., M-1) unnormalized probabilities per bin interval.
    u:       (..., S) uniform draws in [0, 1) (see ``draw_u``).
    Returns  (..., S) samples.
    """
    weights = weights + 1e-5  # prevent nans (reference :339)
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (..., M)

    inds = _searchsorted_right(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, below, axis=-1)
    bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


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
