"""SCADE training losses.

The space-carving loss is the paper's core contribution: it matches samples
drawn from the NeRF's ray-termination distribution against K monocular depth
hypotheses per image (reference: model/run_nerf_helpers.py:93-128).
"""

from __future__ import annotations

import jax.numpy as jnp


def img2mse(x, y):
    return jnp.mean((x - y) ** 2)


def mse2psnr(x):
    return -10.0 * jnp.log(x) / jnp.log(10.0)


def compute_space_carving_loss(
    pred_depth,
    target_hypothesis,
    is_joint: bool = False,
    mask=None,
    norm_p: int = 2,
    threshold: float = 0.0,
):
    """Space-carving loss (reference run_nerf_helpers.py:93-128).

    pred_depth:        (n_rays, n_points) samples from the ray-termination
                       distribution (P_depth draws).
    target_hypothesis: (K, n_rays, 1) one depth per hypothesis per ray, or
                       (K, n_rays, n_points) when quantiles pre-picked one.
    mask:              optional (n_rays,) multiplier on the distances.

    Note on norm_p: the reference computes ``torch.norm(x.unsqueeze(-1),
    p=norm_p, dim=-1)`` — a p-norm over a singleton axis, which equals |x|
    for every p. We replicate that (plain absolute distance); the argument
    is kept for CLI compatibility.

    Reductions:
      is_joint=False: per (ray, point) take the min distance over K
                      hypotheses, then mean over points, then mean over rays.
      is_joint=True:  per hypothesis take the mean over rays, min over K per
                      point, then mean over points (one hypothesis per image).
    """
    del norm_p  # see docstring — singleton-axis p-norm is |x| for all p
    n_points = pred_depth.shape[-1]

    if target_hypothesis.shape[-1] == 1:
        target_hypothesis = jnp.broadcast_to(
            target_hypothesis,
            target_hypothesis.shape[:-1] + (n_points,),
        )

    distances = jnp.abs(pred_depth[None, ...] - target_hypothesis)  # (K, R, P)

    if mask is not None:
        distances = distances * mask[None, :, None]

    if threshold > 0:
        distances = jnp.where(distances < threshold, 0.0, distances)

    if is_joint:
        quantile_mean = jnp.mean(distances, axis=1)  # (K, P) mean over rays
        samples_min = jnp.min(quantile_mean, axis=0)  # (P,)
        return jnp.mean(samples_min)
    best_hyp = jnp.min(distances, axis=0)  # (R, P) each sample picks a hypothesis
    return jnp.mean(jnp.mean(best_hyp, axis=-1))


def is_not_in_expected_distribution(
    depth_mean, depth_var, depth_measurement_mean, depth_measurement_std
):
    """reference run_nerf_helpers.py:25-28."""
    delta_greater = (
        jnp.abs(depth_mean - depth_measurement_mean) - depth_measurement_std
    ) > 0.0
    var_greater = depth_measurement_std**2 < depth_var
    return jnp.logical_or(delta_greater, var_greater)


def compute_depth_loss(depth_map, z_vals, weights, target_depth, target_valid_depth):
    """Gaussian-NLL depth loss (reference run_nerf_helpers.py:30-45).

    Unused by the SCADE training loop but part of the public API. Static
    shapes: boolean masking is done with weights instead of fancy indexing.
    """
    valid = target_valid_depth.astype(depth_map.dtype)
    pred_mean = depth_map
    pred_var = (
        jnp.sum((z_vals - pred_mean[..., None]) ** 2 * weights, axis=-1) + 1e-5
    )
    target_mean = target_depth[..., 0]
    target_std = target_depth[..., 1]

    apply = is_not_in_expected_distribution(
        pred_mean, pred_var, target_mean, target_std
    )
    m = valid * apply.astype(depth_map.dtype)
    n_applied = jnp.sum(m)

    # torch GaussianNLLLoss(eps=1e-3): 0.5 * (log(max(var, eps)) + (x-mu)^2 / max(var, eps))
    var_c = jnp.maximum(pred_var, 1e-3)
    nll = 0.5 * (jnp.log(var_c) + (pred_mean - target_mean) ** 2 / var_c)
    mean_nll = jnp.sum(nll * m) / jnp.maximum(n_applied, 1.0)
    frac = n_applied / depth_map.shape[0]
    return frac * mean_nll


def precompute_quadratic_samples(near, far, num_samples: int):
    """Quadratic depth spacing between near and far (run_nerf_helpers.py:16-23)."""
    start = 0.1
    x = jnp.linspace(0.0, 1.0, num_samples, dtype=jnp.float32)
    c = near
    a = (far - near) / (1.0 + 2.0 * start)
    b = 2.0 * start * a
    return a * x**2 + b * x + c


def compute_monosdf_styleloss(pred_depth, target_depth, mask=None):
    """Scale/shift-invariant MonoSDF-style depth loss (run_nerf_helpers.py:73-89).
    pred_depth: (N,); target_depth: (1, N, 1)-broadcastable target."""
    pred = pred_depth[None, :, None]
    target = jnp.asarray(target_depth).reshape(1, -1, 1)
    m = jnp.ones_like(pred) if mask is None else mask[None, :, None]
    scale, shift = compute_scale_and_shift(pred, target, m)
    pred_ssi = scale.reshape(-1, 1, 1) * pred + shift.reshape(-1, 1, 1)
    # p=2 norm over the singleton last axis == |x|
    return jnp.mean(jnp.abs(pred_ssi - target))


def compute_scale_and_shift(prediction, target, mask):
    """Closed-form per-image least-squares depth alignment (run_nerf_helpers.py:51-71)."""
    a_00 = jnp.sum(mask * prediction * prediction, axis=(1, 2))
    a_01 = jnp.sum(mask * prediction, axis=(1, 2))
    a_11 = jnp.sum(mask, axis=(1, 2))
    b_0 = jnp.sum(mask * prediction * target, axis=(1, 2))
    b_1 = jnp.sum(mask * target, axis=(1, 2))

    det = a_00 * a_11 - a_01 * a_01
    valid = det != 0
    safe_det = jnp.where(valid, det, 1.0)
    x_0 = jnp.where(valid, (a_11 * b_0 - a_01 * b_1) / safe_det, 0.0)
    x_1 = jnp.where(valid, (-a_01 * b_0 + a_00 * b_1) / safe_det, 0.0)
    return x_0, x_1
