"""Evaluation metrics: RMSE (reference metric/rmse.py), PSNR, SSIM.

SSIM replicates skimage.metrics.structural_similarity with its SCADE-call
defaults (reference run_scade_scannet.py:370: ``data_range=1.,
channel_axis=-1``): 7x7 uniform window, K1=0.01/K2=0.03, sample covariance,
per-channel mean. Implemented as VALID-window box filters matching
skimage's crop-then-mean; skimage computes in float64 internally, so with
f32 inputs (x64 disabled) agreement is to f32 windowed-sum precision
(~1e-6 absolute on SSIM), validated in tests/test_ssim.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from scade_tpu.ops.losses import mse2psnr


def to8b(x: np.ndarray) -> np.ndarray:
    return (255 * np.clip(x, 0, 1)).astype(np.uint8)


def to16b(x: np.ndarray) -> np.ndarray:
    return ((2**16 - 1) * np.clip(x, 0, 1)).astype(np.uint16)


def compute_rmse(prediction, target, mask=None):
    """sqrt(mean((p - t)^2)), optionally over a boolean mask (static shape)."""
    if mask is None:
        return jnp.sqrt(jnp.mean((prediction - target) ** 2))
    m = mask.astype(prediction.dtype)
    se = jnp.sum((prediction - target) ** 2 * m)
    return jnp.sqrt(se / jnp.maximum(jnp.sum(m), 1.0))


# alias of losses.mse2psnr — one definition, two reference-parity names
psnr_from_mse = mse2psnr


def _box_filter_valid(img, win: int):
    """Mean over win x win windows, VALID padding. img: (H, W) or (H, W, C).

    Separable direct windowed sums (lax.reduce_window): each 1-D pass sums
    only ``win`` elements, so there is no cumsum-style catastrophic
    cancellation on megapixel images — window error stays at ~ulp(win·|x|)
    instead of ~ulp(sum over the whole image).
    """
    def box1d(x, axis):
        window = [1] * x.ndim
        window[axis] = win
        return jax.lax.reduce_window(
            x,
            jnp.zeros((), x.dtype),
            jax.lax.add,
            tuple(window),
            (1,) * x.ndim,
            "VALID",
        )

    s = box1d(box1d(img, 0), 1)
    return s / (win * win)


def ssim(
    img0,
    img1,
    data_range: float = 1.0,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
):
    """Mean structural similarity, skimage-compatible.

    img0/img1: (H, W) or (H, W, C) in [0, data_range].
    """
    img0 = img0.astype(jnp.float64) if img0.dtype == jnp.float64 else img0.astype(jnp.float32)
    img1 = img1.astype(img0.dtype)

    np_win = win_size * win_size
    cov_norm = np_win / (np_win - 1.0)  # sample covariance (skimage default)

    ux = _box_filter_valid(img0, win_size)
    uy = _box_filter_valid(img1, win_size)
    uxx = _box_filter_valid(img0 * img0, win_size)
    uyy = _box_filter_valid(img1 * img1, win_size)
    uxy = _box_filter_valid(img0 * img1, win_size)

    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2

    s = (a1 * a2) / (b1 * b2)
    return jnp.mean(s)
