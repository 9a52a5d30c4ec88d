"""ctypes bindings for the native scene cache (native/scene_cache.cc).

Speeds up the hypothesis-dump load path: the reference loads 20 x N_train
small .npy files serially through Python (data/load_scene.py:316-345); the
native path parallel-preads them in a C++ thread pool (header pre-pass AND
payload reads), and packs them into one contiguous SCBLOB01 blob so warm
restarts of a 500k-step run do a single sequential read (see
scene.py _load_hypotheses).

Falls back to numpy transparently when the .so can't be built — including
for blobs: the fallback speaks the SAME on-disk SCBLOB01 format, so a blob
written before the lib existed stays readable after it appears (and vice
versa).
"""

from __future__ import annotations

import ctypes
import os
import struct
from typing import List, Sequence

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_native.so")
_SRC_PATH = os.path.join(
    os.path.dirname(__file__), "..", "..", "native", "scene_cache.cc"
)
_MAGIC = b"SCBLOB01"
_lib = None


def build(out_path: str = _LIB_PATH, src: str = _SRC_PATH) -> bool:
    """Compile the native lib (single source of truth for the g++ command;
    tools/build_native.py calls this). Atomic: compiles to a temp file and
    os.replace()s it in, so a concurrent process never dlopens a
    half-written .so."""
    import shutil
    import subprocess
    import tempfile

    if shutil.which("g++") is None or not os.path.exists(src):
        return False
    fd, tmp = tempfile.mkstemp(
        suffix=".so", dir=os.path.dirname(out_path) or "."
    )
    os.close(fd)
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             src, "-o", tmp],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, out_path)
        return True
    except Exception:
        try:
            os.remove(tmp)
        except OSError:
            pass
        return False


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    stale = (
        os.path.exists(_LIB_PATH)
        and os.path.exists(_SRC_PATH)
        and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_LIB_PATH)
    )
    # missing or stale (source newer than binary → ABI may have changed):
    # only a successful rebuild makes the binary loadable
    if (not os.path.exists(_LIB_PATH) or stale) and not build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.scade_npy_count.restype = ctypes.c_int64
        lib.scade_npy_count.argtypes = [ctypes.c_char_p]
        lib.scade_npy_count_batch.restype = ctypes.c_int64
        lib.scade_npy_count_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ]
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
        lib.scade_blob_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64)
        ]
        lib.scade_read_blob.restype = ctypes.c_int64
        lib.scade_read_blob.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ]
    except OSError:
        # corrupt/incompatible binary (e.g. written by a crashed build on
        # an older toolchain): behave as if the lib were absent
        return None
    _lib = lib
    return lib


def available() -> bool:
    return _load_lib() is not None


def load_npy_batch(paths: Sequence[str], n_threads: int = 0) -> List[np.ndarray]:
    """Load float32 .npy files in parallel. Shapes are flattened (callers
    reshape — the SCADE hypothesis files are all (H, W)). Falls back to
    serial numpy when the native lib is missing or any file is unsupported."""
    lib = _load_lib()
    if lib is None or not paths:
        return [np.load(p).astype(np.float32).ravel() for p in paths]

    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    counts_pre = np.empty(n, np.int64)
    pre_failures = lib.scade_npy_count_batch(
        c_paths, n,
        counts_pre.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_threads,
    )
    if pre_failures:
        return [np.load(p).astype(np.float32).ravel() for p in paths]

    offsets = np.zeros(n, np.int64)
    np.cumsum(counts_pre[:-1], out=offsets[1:])
    total = int(offsets[-1] + counts_pre[-1])
    out = np.empty(total, np.float32)
    counts = np.empty(n, np.int64)

    failures = lib.scade_load_npy_batch(
        c_paths, n,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        counts_pre.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
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
    """Pack arrays into one SCBLOB01 file (same on-disk format with or
    without the native lib — see scene_cache.cc:15-19 for the layout)."""
    lib = _load_lib()
    flats = [np.ascontiguousarray(a, np.float32).ravel() for a in arrays]
    sizes = np.array([f.size for f in flats], np.int64)
    data = np.concatenate(flats) if flats else np.empty(0, np.float32)
    if lib is None:
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(_MAGIC)
            f.write(struct.pack("<Q", len(flats)))
            off = 0
            for s in sizes:
                f.write(struct.pack("<QQ", off, int(s)))
                off += int(s)
            f.write(data.astype("<f4").tobytes())
        os.replace(tmp, path)
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
        with open(path, "rb") as f:
            if f.read(8) != _MAGIC:
                raise IOError(f"bad blob {path}")
            (n,) = struct.unpack("<Q", f.read(8))
            index = np.frombuffer(f.read(16 * n), "<u8").reshape(n, 2)
            total = int(index[-1].sum()) if n else 0
            data = np.frombuffer(f.read(4 * total), "<f4")
        if data.size != total:
            raise IOError(f"truncated blob {path}")
        return [
            data[int(o) : int(o) + int(s)] for o, s in index
        ]
    n_arrays = ctypes.c_int64(0)
    total = lib.scade_blob_info(path.encode(), ctypes.byref(n_arrays))
    if total < 0:
        raise IOError(f"bad blob {path}")
    out = np.empty(int(total), np.float32)
    sizes = np.empty(max(int(n_arrays.value), 1), np.int64)
    rc = lib.scade_read_blob(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        int(n_arrays.value),
    )
    if rc != 0:
        raise IOError(f"scade_read_blob failed for {path}")
    arrays, off = [], 0
    for s in sizes[: int(n_arrays.value)]:
        arrays.append(out[off : off + int(s)])
        off += int(s)
    return arrays
