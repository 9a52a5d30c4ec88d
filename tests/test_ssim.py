"""SSIM validation against a direct sliding-window computation (skimage's
algorithm written out longhand) — verifies the separable box-filter trick."""

import numpy as np

import jax.numpy as jnp

from scade_tpu.ops.metrics import ssim


def _ssim_direct(a, b, win=7, k1=0.01, k2=0.03, data_range=1.0):
    """Literal skimage structural_similarity: per-channel VALID windows,
    sample covariance, mean over the cropped map."""
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    H, W, C = a.shape
    npix = win * win
    cov_norm = npix / (npix - 1)
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    vals = []
    for ch in range(C):
        for i in range(H - win + 1):
            for j in range(W - win + 1):
                x = a[i : i + win, j : j + win, ch]
                y = b[i : i + win, j : j + win, ch]
                ux, uy = x.mean(), y.mean()
                vx = cov_norm * (np.mean(x * x) - ux * ux)
                vy = cov_norm * (np.mean(y * y) - uy * uy)
                vxy = cov_norm * (np.mean(x * y) - ux * uy)
                s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
                    (ux**2 + uy**2 + c1) * (vx + vy + c2)
                )
                vals.append(s)
    return float(np.mean(vals))


def test_ssim_matches_direct_computation():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (12, 14, 3)).astype(np.float64)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1)
    ours = float(ssim(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))
    direct = _ssim_direct(a.astype(np.float32), b.astype(np.float32))
    assert abs(ours - direct) < 1e-5


def test_ssim_identity_and_bounds():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    assert float(ssim(jnp.asarray(a), jnp.asarray(a))) > 0.9999
    worse = float(ssim(jnp.asarray(a), jnp.asarray(1.0 - a)))
    assert worse < 0.5
