"""Synthetic depth-sensor degradation (reference: data/error_sources.py:3-21).

Used by the depth-completion training flow to corrupt clean depth. Pure
functions over (key, depth, valid) — RNG is explicit jax.random.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def add_missing_depth(key, depth, valid_depth, p: float = 0.1,
                      invalid_depth_value: float = 0.0):
    """Invalidate random pixels until the TOTAL invalid fraction reaches p
    (reference :3-15): if the map is already sparser than p this is a
    no-op; otherwise each currently-valid pixel is dropped with probability
    (p - p_before) * n_pixels / n_valid. Returns (depth, valid)."""
    valid = valid_depth.astype(bool)
    n_pixels = valid.size
    n_valid = jnp.sum(valid)
    p_before = (n_pixels - n_valid).astype(jnp.float32) / n_pixels
    p_gap = jnp.maximum(p - p_before, 0.0)
    p_inv = p_gap * n_pixels / jnp.maximum(n_valid, 1).astype(jnp.float32)
    drop = jax.random.uniform(key, depth.shape) < p_inv
    new_valid = valid & ~drop
    # ONLY drawn pixels are rewritten (reference :13-14 indexes by the
    # draw): previously-invalid pixels keep whatever depth value they carry
    new_depth = jnp.where(drop, invalid_depth_value, depth).astype(depth.dtype)
    return new_depth, new_valid


def add_quadratic_depth_noise(key, depth, valid_depth, a: float = 1.68e-3,
                              b: float = 6.58e-3, c: float = 4.78e-2):
    """Kinect-style noise at VALID pixels only (reference :17-21):
    d += randn * (a*d^2 + b*d + c), clamped to >= 0."""
    valid = valid_depth.astype(bool)
    std = a * depth**2 + b * depth + c
    noisy = jnp.maximum(depth + jax.random.normal(key, depth.shape) * std, 0.0)
    return jnp.where(valid, noisy, depth).astype(depth.dtype)
