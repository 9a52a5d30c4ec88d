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


def test_native_lib_builds_when_toolchain_present():
    """On an image with g++ the native path must actually be exercised —
    without this assertion a compile breakage silently downgrades every
    test here to fallback-only coverage."""
    import shutil

    if shutil.which("g++") is None:
        import pytest

        pytest.skip("no g++ in this image")
    assert nc.available()


def test_fallback_paths_match_native(tmp_path, monkeypatch):
    """The numpy fallback speaks the same SCBLOB01 on-disk format: blobs
    written in one mode read back in the other, and load_npy_batch agrees
    with the native loader."""
    rng = np.random.default_rng(3)
    arrays = [rng.standard_normal((5, 4)).astype(np.float32) for _ in range(4)]
    paths = []
    for i, a in enumerate(arrays):
        p = str(tmp_path / f"x{i}.npy")
        np.save(p, a)
        paths.append(p)
    native_loaded = nc.load_npy_batch(paths) if nc.available() else None
    blob_native = str(tmp_path / "native.blob")
    if nc.available():
        nc.write_blob(blob_native, arrays)

    monkeypatch.setattr(nc, "_load_lib", lambda: None)
    assert not nc.available()
    fb_loaded = nc.load_npy_batch(paths)
    for a, l in zip(arrays, fb_loaded):
        np.testing.assert_array_equal(a.ravel(), l)
    if native_loaded is not None:
        for a, b in zip(native_loaded, fb_loaded):
            np.testing.assert_array_equal(a, b)
    # fallback writes a blob the native reader later accepts, and reads
    # the native-written blob
    blob_fb = str(tmp_path / "fb.blob")
    nc.write_blob(blob_fb, arrays)
    for a, b in zip(arrays, nc.read_blob(blob_fb)):
        np.testing.assert_array_equal(a.ravel(), b)
    if os.path.exists(blob_native):
        for a, b in zip(arrays, nc.read_blob(blob_native)):
            np.testing.assert_array_equal(a.ravel(), b)
    monkeypatch.undo()
    if nc.available():
        for a, b in zip(arrays, nc.read_blob(blob_fb)):
            np.testing.assert_array_equal(a.ravel(), b)


def test_hypothesis_blob_cache_warm_restart(tmp_path):
    """Second _load_hypotheses call reads the packed blob; editing one .npy
    invalidates the cache and the new values are served."""
    from scade_tpu.data.scene import _load_hypotheses

    base = tmp_path / "scene"
    leres = base / "train" / "leres_cimle" / "dump"
    os.makedirs(leres)
    rng = np.random.default_rng(4)
    K, H, W = 2, 4, 6
    fnames = ["train/rgb/0.jpg"]
    for j in range(K):
        np.save(leres / f"0_{j}.npy",
                rng.uniform(0.5, 8.0, (H, W)).astype(np.float32))
    first = _load_hypotheses(str(base), "dump", fnames, [0], K, 0.1, 10.0)
    assert (leres / ".scade_hyp_cache.blob").exists()
    assert (leres / ".scade_hyp_cache.blob.json").exists()
    second = _load_hypotheses(str(base), "dump", fnames, [0], K, 0.1, 10.0)
    np.testing.assert_array_equal(first, second)

    # invalidation: rewrite one hypothesis with different values
    new = np.full((H, W), 3.25, np.float32)
    np.save(leres / "0_1.npy", new)
    third = _load_hypotheses(str(base), "dump", fnames, [0], K, 0.1, 10.0)
    np.testing.assert_array_equal(third[0, 1, ..., 0], new)
    np.testing.assert_array_equal(third[0, 0], first[0, 0])
