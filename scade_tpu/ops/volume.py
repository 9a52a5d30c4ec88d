"""Volume rendering: densities+colors along rays → pixel values.

Semantics match the reference exactly (reference: run_scade_scannet.py:511-579):
the model emits softplus(beta=10) densities; ``compute_weights`` then applies
relu (a no-op on positive densities unless noise pushes them negative),
``alpha = 1 - exp(-sigma * dist)``, and an exclusive cumprod transmittance
with the classic ``1e-10`` floor.

All randomness is an explicit argument (``t_rand``/``noise``) so callers
thread ``jax.random`` keys and golden tests can inject fixed draws.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Effectively-infinite final sample-to-sample distance (reference :515).
_LAST_DIST = 1e10


def stratified_z_vals(near, far, N_samples: int, lindisp: bool = False):
    """Evenly spaced depths between per-ray near/far (run_scade_scannet.py:640-651).

    near/far: (..., 1) → returns (..., N_samples).
    """
    t_vals = jnp.linspace(0.0, 1.0, N_samples, dtype=jnp.float32)
    if not lindisp:
        return near * (1.0 - t_vals) + far * t_vals
    return 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)


def perturb_z_vals(z_vals, t_rand):
    """Jitter each sample uniformly within its stratum (run_scade_scannet.py:564-579).

    ``t_rand``: uniform [0,1) draws with z_vals' shape, supplied by the caller.
    """
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
    return lower + (upper - lower) * t_rand


def compute_weights(raw, z_vals, rays_d, noise=0.0):
    """Per-sample compositing weights (run_scade_scannet.py:511-522).

    raw:    (..., S, 4) model output; raw[..., 3] is the (softplus'd) density.
    z_vals: (..., S) sample depths.
    rays_d: (..., 3) ray directions (not normalized — their norm converts
            depth deltas to metric distances).
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], _LAST_DIST)], axis=-1
    )
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    sigma = jax.nn.relu(raw[..., 3] + noise)
    alpha = 1.0 - jnp.exp(-sigma * dists)

    # exclusive cumprod of transmittance, with the reference's 1e-10 floor
    trans = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1
        ),
        axis=-1,
    )[..., :-1]
    return alpha * trans


def raw2depth(raw, z_vals, rays_d):
    """Expected termination depth and its std (run_scade_scannet.py:524-528)."""
    weights = compute_weights(raw, z_vals, rays_d)
    depth = jnp.sum(weights * z_vals, axis=-1)
    std = jnp.sqrt(
        jnp.sum((z_vals - depth[..., None]) ** 2 * weights, axis=-1)
    )
    return depth, std


def raw2outputs(raw, z_vals, rays_d, noise=0.0):
    """Full compositing (run_scade_scannet.py:530-562).

    Returns (rgb_map, disp_map, acc_map, weights, depth_map).
    ``noise`` is either 0.0 or a pre-drawn (..., S) array of
    ``randn * raw_noise_std`` — RNG lives with the caller.
    """
    rgb = jax.nn.sigmoid(raw[..., :3])
    weights = compute_weights(raw, z_vals, rays_d, noise)

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / acc_map)

    return rgb_map, disp_map, acc_map, weights, depth_map
