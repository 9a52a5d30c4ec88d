"""Synthetic depth-sensor degradation (reference: data/error_sources.py:3-21).

Used by the depth-completion training flow to corrupt clean depth. Pure
functions over (depth, keys) — RNG is explicit jax.random.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def add_missing_depth(key, depth, p_missing: float = 0.1):
    """Zero out a random fraction of depth pixels (reference :3-15)."""
    keep = jax.random.uniform(key, depth.shape) >= p_missing
    return depth * keep.astype(depth.dtype)


def add_quadratic_depth_noise(key, depth, a: float = 0.0019, b: float = 0.0006):
    """Kinect-style noise: sigma grows quadratically with depth
    (reference :17-21): d += randn * (a*d^2 + b*d)."""
    sigma = a * depth**2 + b * depth
    return depth + jax.random.normal(key, depth.shape) * sigma
