"""ctypes bindings for the native scene cache (native/scene_cache.cc).

Speeds up the hypothesis-dump load path: the reference loads 20 x N_train
small .npy files serially through Python (data/load_scene.py:316-345); the
native path parallel-preads them in a C++ thread pool, and optionally packs
them into one contiguous blob so warm restarts of a 500k-step run do a
single sequential read.

Falls back to numpy transparently when the .so hasn't been built
(`python tools/build_native.py`).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_native.so")
_lib = None


def _build_if_possible() -> bool:
    """One-shot best-effort build of the native lib (g++ in this image)."""
    import shutil
    import subprocess

    src = os.path.join(
        os.path.dirname(__file__), "..", "..", "native", "scene_cache.cc"
    )
    if shutil.which("g++") is None or not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             src, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(
        os.path.dirname(__file__), "..", "..", "native", "scene_cache.cc"
    )
    stale = (
        os.path.exists(_LIB_PATH)
        and os.path.exists(src)
        and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    )
    # missing or stale (source newer than binary → ABI may have changed):
    # only a successful rebuild makes the binary loadable
    if (not os.path.exists(_LIB_PATH) or stale) and not _build_if_possible():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.scade_npy_count.restype = ctypes.c_int64
    lib.scade_npy_count.argtypes = [ctypes.c_char_p]
    lib.scade_load_npy_batch.restype = ctypes.c_int64
    lib.scade_load_npy_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int,
    ]
    lib.scade_write_blob.restype = ctypes.c_int64
    lib.scade_write_blob.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
    ]
    lib.scade_blob_info.restype = ctypes.c_int64
    lib.scade_blob_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64)]
    lib.scade_read_blob.restype = ctypes.c_int64
    lib.scade_read_blob.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load_lib() is not None


def load_npy_batch(paths: Sequence[str], n_threads: int = 0) -> List[np.ndarray]:
    """Load float32 .npy files in parallel. Shapes are flattened (callers
    reshape — the SCADE hypothesis files are all (H, W)). Falls back to
    serial numpy when the native lib is missing or any file is unsupported."""
    lib = _load_lib()
    if lib is None:
        return [np.load(p).astype(np.float32).ravel() for p in paths]

    n = len(paths)
    counts_pre = [lib.scade_npy_count(p.encode()) for p in paths]
    if any(c < 0 for c in counts_pre):
        return [np.load(p).astype(np.float32).ravel() for p in paths]

    offsets = np.zeros(n, np.int64)
    np.cumsum(counts_pre[:-1], out=offsets[1:])
    total = int(offsets[-1] + counts_pre[-1]) if n else 0
    capacities = np.asarray(counts_pre, np.int64)
    out = np.empty(total, np.float32)
    counts = np.empty(n, np.int64)

    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.scade_load_npy_batch(
        c_paths, n,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        capacities.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_threads,
    )
    if failures:
        return [np.load(p).astype(np.float32).ravel() for p in paths]
    return [
        out[int(o) : int(o) + int(c)] for o, c in zip(offsets, counts)
    ]


def write_blob(path: str, arrays: Sequence[np.ndarray]) -> None:
    lib = _load_lib()
    flats = [np.ascontiguousarray(a, np.float32).ravel() for a in arrays]
    sizes = np.array([f.size for f in flats], np.int64)
    data = np.concatenate(flats) if flats else np.empty(0, np.float32)
    if lib is None:
        np.savez(path + ".npz", data=data, sizes=sizes)
        return
    rc = lib.scade_write_blob(
        path.encode(),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(flats),
    )
    if rc != 0:
        raise IOError(f"scade_write_blob failed for {path}")


def read_blob(path: str) -> List[np.ndarray]:
    lib = _load_lib()
    if lib is None:
        z = np.load(path + ".npz")
        data, sizes = z["data"], z["sizes"]
        out, off = [], 0
        for s in sizes:
            out.append(data[off : off + int(s)])
            off += int(s)
        return out
    n_arrays = ctypes.c_int64(0)
    total = lib.scade_blob_info(path.encode(), ctypes.byref(n_arrays))
    if total < 0:
        raise IOError(f"bad blob {path}")
    out = np.empty(int(total), np.float32)
    sizes = np.empty(int(n_arrays.value), np.int64)
    rc = lib.scade_read_blob(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        int(n_arrays.value),
    )
    if rc != 0:
        raise IOError(f"scade_read_blob failed for {path}")
    arrays, off = [], 0
    for s in sizes:
        arrays.append(out[off : off + int(s)])
        off += int(s)
    return arrays
