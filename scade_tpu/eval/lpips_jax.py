"""LPIPS(alex) perceptual metric in JAX.

The reference scores test renders with lpips.LPIPS(net='alex')
(reference: run_scade_scannet.py:371,1254). That package ships pretrained
AlexNet features + learned linear heads; neither lpips nor torchvision is
installable here and there is no network egress, so weights cannot be
fetched at build time. This module therefore:

- implements the full LPIPS(alex) forward in jnp (conv feature pyramid →
  unit-normalize channels → learned 1x1 heads → spatial mean), and
- loads weights from an .npz produced by ``tools/export_lpips_weights.py``
  on any machine that has the torch lpips package, looked up at
  ``$SCADE_LPIPS_WEIGHTS`` or ``~/.cache/scade_tpu/lpips_alex.npz``.

Without a weights file, ``available()`` is False and callers report NaN for
lpips (metrics.txt keeps the column; PSNR/SSIM/RMSE are unaffected).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_ALEX_CFG = [
    # (out_ch, kernel, stride, pad) — torchvision AlexNet features
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}  # maxpool(3, 2) after these conv indices (and relu all)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def default_weights_path() -> str:
    return os.environ.get(
        "SCADE_LPIPS_WEIGHTS",
        os.path.expanduser("~/.cache/scade_tpu/lpips_alex.npz"),
    )


def load_weights(path: Optional[str] = None):
    path = path or default_weights_path()
    if not os.path.exists(path):
        return None
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in data.files}


def available(path: Optional[str] = None) -> bool:
    p = path or default_weights_path()
    return os.path.exists(p)


def _conv(x, w, b, stride, pad):
    # w: torch layout (out, in, kh, kw); x: (N, C, H, W)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + b[None, :, None, None]


def _maxpool(x, k=3, s=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, s, s), "VALID"
    )


def _alex_features(params, x):
    feats = []
    for i in range(len(_ALEX_CFG)):
        _, _, stride, pad = _ALEX_CFG[i]
        x = _conv(x, params[f"conv{i}_w"], params[f"conv{i}_b"], stride, pad)
        x = jax.nn.relu(x)
        feats.append(x)
        if i in _POOL_AFTER:
            x = _maxpool(x)
    return feats


def lpips_alex(params, img0, img1):
    """LPIPS(alex) with normalize=True semantics: inputs are (H, W, 3) in
    [0, 1] (the reference passes clamped renders, run_scade_scannet.py:371)."""
    def prep(img):
        x = img.astype(jnp.float32) * 2.0 - 1.0  # normalize=True: [0,1]→[-1,1]
        x = (x - _SHIFT) / _SCALE  # lpips scaling layer
        return jnp.transpose(x, (2, 0, 1))[None]  # (1, 3, H, W)

    f0s = _alex_features(params, prep(img0))
    f1s = _alex_features(params, prep(img1))
    total = 0.0
    for i, (f0, f1) in enumerate(zip(f0s, f1s)):
        n0 = f0 / jnp.sqrt(jnp.sum(f0**2, axis=1, keepdims=True) + 1e-10)
        n1 = f1 / jnp.sqrt(jnp.sum(f1**2, axis=1, keepdims=True) + 1e-10)
        diff = (n0 - n1) ** 2
        w = params[f"lin{i}_w"].reshape(1, -1, 1, 1)  # learned 1x1 head
        total = total + jnp.mean(jnp.sum(diff * w, axis=1))
    return total


class LPIPSAlex:
    """Callable wrapper; returns NaN when weights are unavailable."""

    def __init__(self, weights_path: Optional[str] = None):
        self.params = load_weights(weights_path)
        self._fn = None
        if self.params is not None:
            self._fn = jax.jit(lambda a, b: lpips_alex(self.params, a, b))

    @property
    def ok(self) -> bool:
        return self.params is not None

    def __call__(self, img0, img1) -> float:
        if self._fn is None:
            return float("nan")
        return float(self._fn(jnp.asarray(img0), jnp.asarray(img1)))
