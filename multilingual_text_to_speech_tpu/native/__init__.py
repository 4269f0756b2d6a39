"""Native (C) components: build-on-first-use via the system compiler,
loaded through ctypes, with pure-Python fallbacks.

The reference is pure Python (SURVEY.md §2: no native components anywhere);
here the evaluation data path's exact-DTW alignment gets a C kernel because
the interpreted O(T1*T2) loop dominates MCD evaluation time.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False


def _build_library() -> Optional[str]:
    """Compile dtw.c into a cached shared object; returns its path."""
    src = os.path.join(_THIS_DIR, "dtw.c")
    cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "multilingual_text_to_speech_tpu",
    )
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, "libdtw.so")
    if os.path.exists(lib_path) and (
        os.path.getmtime(lib_path) >= os.path.getmtime(src)
    ):
        return lib_path

    for compiler in ("cc", "gcc", "g++", "clang"):
        try:
            # build to a temp file then move atomically (parallel pytest)
            fd, tmp = tempfile.mkstemp(suffix=".so", dir=cache_dir)
            os.close(fd)
            subprocess.run(
                [compiler, "-O3", "-shared", "-fPIC", src, "-o", tmp, "-lm"],
                check=True, capture_output=True,
            )
            os.replace(tmp, lib_path)
            return lib_path
        except (subprocess.CalledProcessError, FileNotFoundError, OSError):
            try:
                os.unlink(tmp)
            except OSError:
                pass
            continue
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _BUILD_FAILED
    if _LIB is not None or _BUILD_FAILED:
        return _LIB
    lib_path = _build_library()
    if lib_path is None:
        _BUILD_FAILED = True
        return None
    try:
        lib = ctypes.CDLL(lib_path)
        lib.dtw_path.restype = ctypes.c_int
        lib.dtw_path.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.dtw_path_from_dist.restype = ctypes.c_int
        lib.dtw_path_from_dist.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        _LIB = lib
    except OSError:
        _BUILD_FAILED = True
    return _LIB


def native_dtw_available() -> bool:
    return _load() is not None


def dtw_path_native(x: np.ndarray, y: np.ndarray):
    """Exact DTW path: pairwise distances via one BLAS matmul (numpy), then
    the serial DP + backtrack in C; returns (path_x, path_y) or None when
    the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float32)
    y = np.ascontiguousarray(y, dtype=np.float32)
    t1, d = x.shape
    t2, d2 = y.shape
    assert d == d2, "frame dimensions must match"

    # Euclidean distance matrix in one shot: much faster than per-cell loops
    sq = (
        (x * x).sum(1)[:, None] + (y * y).sum(1)[None, :]
        - 2.0 * (x @ y.T)
    )
    dist = np.sqrt(np.maximum(sq, 0.0), dtype=np.float32)
    dist = np.ascontiguousarray(dist, dtype=np.float32)

    path_x = np.empty(t1 + t2, dtype=np.int32)
    path_y = np.empty(t1 + t2, dtype=np.int32)
    n = lib.dtw_path_from_dist(
        dist.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t1, t2,
        path_x.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        path_y.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    if n < 0:
        return None
    return path_x[:n].astype(np.int64), path_y[:n].astype(np.int64)
