"""Ray generation from camera intrinsics + poses.

Pixel convention (reference: model/run_nerf_helpers.py:285-305): rays pass
through pixel centers (+0.5), the y axis is flipped (``H - (j+0.5) - cy``)
and the camera looks down -z. ``intrinsic`` is a 4-vector (fx, fy, cx, cy).

TPU-first: all functions are shape-polymorphic pure jnp and work equally on
a full (H, W) grid or on a gathered (N, 2) coordinate list — the training
path generates rays *only at the sampled pixels* instead of materializing
the full image grid every step like the reference does.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_grid_coords(H: int, W: int, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 2) array of (row, col) pixel coordinates."""
    jj, ii = jnp.meshgrid(
        jnp.arange(H, dtype=dtype), jnp.arange(W, dtype=dtype), indexing="ij"
    )
    return jnp.stack([jj, ii], axis=-1)


def _dirs_from_pixels(i, j, H, intrinsic):
    """Camera-frame ray directions for pixel columns ``i`` / rows ``j``."""
    fx, fy, cx, cy = intrinsic[0], intrinsic[1], intrinsic[2], intrinsic[3]
    return jnp.stack(
        [
            ((i + 0.5) - cx) / fx,
            (H - (j + 0.5) - cy) / fy,
            -jnp.ones_like(i),
        ],
        axis=-1,
    )


def get_ray_dirs(H: int, W: int, intrinsic, c2w, coords=None) -> jnp.ndarray:
    """World-frame ray directions.

    With ``coords=None`` returns the full (H, W, 3) grid; with ``coords``
    of shape (N, 2) holding (row, col) pairs returns (N, 3).
    Matches reference get_ray_dirs (run_nerf_helpers.py:285-298).
    """
    if coords is None:
        jj, ii = jnp.meshgrid(
            jnp.arange(H, dtype=jnp.float32),
            jnp.arange(W, dtype=jnp.float32),
            indexing="ij",
        )
    else:
        ii, jj = coords[..., 1], coords[..., 0]
    dirs = _dirs_from_pixels(ii, jj, H, intrinsic)
    # rotate camera → world: rays_d[k] = sum_l dirs[l] * c2w[k, l].
    # precision=HIGHEST: the reference computes this as an f32 elementwise
    # sum-product (run_nerf_helpers.py:298); a DEFAULT-precision dot on TPU
    # would truncate dirs/c2w to bf16 (~2-3 px misprojection at image edges).
    return jnp.einsum(
        "...l,kl->...k", dirs, c2w[:3, :3], precision=jax.lax.Precision.HIGHEST
    )


def get_rays(H: int, W: int, intrinsic, c2w, coords=None):
    """(rays_o, rays_d) world-frame origins and directions."""
    rays_d = get_ray_dirs(H, W, intrinsic, c2w, coords)
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def get_rays_at_coords(intrinsic, c2w, coords, H: int):
    """Rays for a gathered (N, 2) list of (row, col) pixel coords.

    This is the hot-path variant used by the train step: O(N_rand) work,
    no (H, W) grid materialization.
    """
    return get_rays(H, 0, intrinsic, c2w, coords=coords)


def ndc_rays(H: int, W: int, focal, near, rays_o, rays_d):
    """Shift rays to the near plane and project to NDC (run_nerf_helpers.py:316-333)."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2]
    )
    d1 = -1.0 / (H / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2]
    )
    d2 = -2.0 * near / rays_o[..., 2]

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)
