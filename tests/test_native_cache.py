"""Native scene-cache tests (skip payload checks if the .so isn't built —
the numpy fallback is exercised either way)."""

import os
import subprocess
import sys

import numpy as np

from scade_tpu.data import native_cache as nc


def test_load_npy_batch_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    arrays, paths = [], []
    for i in range(12):
        a = rng.standard_normal((24, 31)).astype(np.float32)
        p = str(tmp_path / f"h{i}.npy")
        np.save(p, a)
        arrays.append(a)
        paths.append(p)
    loaded = nc.load_npy_batch(paths)
    for a, l in zip(arrays, loaded):
        np.testing.assert_array_equal(a.ravel(), l)


def test_blob_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    arrays = [rng.standard_normal(s).astype(np.float32) for s in ((7,), (4, 5), (2, 3, 4))]
    blob = str(tmp_path / "pack.blob")
    nc.write_blob(blob, arrays)
    back = nc.read_blob(blob)
    assert len(back) == 3
    for a, b in zip(arrays, back):
        np.testing.assert_array_equal(a.ravel(), b)


def test_scene_loader_uses_batch_path(tmp_path):
    """The hypothesis loader goes through load_npy_batch and reproduces the
    reference's per-file semantics (clip to [near, far])."""
    from scade_tpu.data.scene import _load_hypotheses

    base = tmp_path / "scene"
    leres = base / "train" / "leres_cimle" / "dump"
    os.makedirs(leres)
    rng = np.random.default_rng(2)
    K, H, W = 3, 6, 8
    raw = {}
    fnames = ["train/rgb/0.jpg", "train/rgb/1.jpg"]
    for i in range(2):
        for j in range(K):
            a = rng.uniform(0.0, 12.0, (H, W)).astype(np.float32)
            np.save(leres / f"{i}_{j}.npy", a)
            raw[(i, j)] = a
    hyp = _load_hypotheses(str(base), "dump", fnames, [0, 1], K, 0.5, 8.0)
    assert hyp.shape == (2, K, H, W, 1)
    for i in range(2):
        for j in range(K):
            np.testing.assert_array_equal(
                hyp[i, j, ..., 0], np.clip(raw[(i, j)], 0.5, 8.0)
            )
