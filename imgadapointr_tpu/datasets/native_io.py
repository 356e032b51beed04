"""ctypes bindings for the native point-cloud IO library (native/pcio.cpp).

The reference's input path runs on native code (open3d C++ readers + torch
DataLoader worker processes); this is the TPU framework's equivalent. The
library auto-builds with g++ on first use and every entry point falls back
to the pure-Python readers when the toolchain or the build is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libpcio.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "build/libpcio.so"],
            cwd=_NATIVE_DIR, check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.pcio_read_cloud.restype = ctypes.c_int64
        lib.pcio_read_cloud.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        lib.pcio_sample.restype = None
        lib.pcio_sample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_uint64,
        ]
        lib.pcio_load_batch.restype = ctypes.c_int64
        lib.pcio_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_uint64, ctypes.c_int64,
        ]
        _lib = lib
        return _lib


MAX_RAW_POINTS = 1 << 18  # 262144 (GRNet gridding-reverse output size)


def read_cloud(path: str) -> np.ndarray | None:
    """Native read of one cloud → (N, 3) float32, or None (caller falls back)."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((MAX_RAW_POINTS, 3), np.float32)
    n = lib.pcio_read_cloud(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        MAX_RAW_POINTS,
    )
    if n <= 0:
        return None
    return out[:n].copy()


def load_batch(paths: list[str], n_points: int, seed: int) -> np.ndarray | None:
    """Parallel native read+RandomSamplePoints of a whole batch →
    (B, n_points, 3) float32, or None on any failure."""
    lib = get_lib()
    if lib is None:
        return None
    B = len(paths)
    out = np.zeros((B, n_points, 3), np.float32)
    arr = (ctypes.c_char_p * B)(*[p.encode() for p in paths])
    ok = lib.pcio_load_batch(
        arr, B, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_points, seed & 0xFFFFFFFFFFFFFFFF, MAX_RAW_POINTS,
    )
    if ok != B:
        return None
    return out
