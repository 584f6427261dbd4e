"""ctypes binding for the native C++ image pipeline.

Builds `libimage_ops.so` on demand (g++ + libjpeg/libpng, both baked in)
and exposes batch JPEG/PNG decode + resize.  Falls back gracefully when
the toolchain is unavailable (`load()` returns None and the python/cv2
path in `pipeline.py` is used instead).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "_native", "image_ops.cpp")
_LIB = os.path.join(_HERE, "_native", "libimage_ops.so")
_LOCK = threading.Lock()
_CACHED: Optional[ctypes.CDLL] = None
_FAILED = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB,
           "-ljpeg", "-lpng", "-pthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _CACHED, _FAILED
    with _LOCK:
        if _CACHED is not None:
            return _CACHED
        if _FAILED:
            return None
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build():
                _FAILED = True
                return None
        lib = ctypes.CDLL(_LIB)
        lib.mvsdet_load_resize_rgb.restype = ctypes.c_int
        lib.mvsdet_load_resize_rgb.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte)]
        lib.mvsdet_load_depth_png.restype = ctypes.c_int
        lib.mvsdet_load_depth_png.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_float]
        lib.mvsdet_load_batch_rgb.restype = ctypes.c_int
        lib.mvsdet_load_batch_rgb.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
        _CACHED = lib
        return lib


def load_resize_rgb(path: str, hw: Tuple[int, int]) -> np.ndarray:
    """Decode one JPEG/PNG and resize to (h, w); returns (h, w, 3) uint8."""
    lib = load()
    if lib is None:
        raise RuntimeError("native image library unavailable")
    h, w = hw
    out = np.empty((h, w, 3), np.uint8)
    rc = lib.mvsdet_load_resize_rgb(
        path.encode(), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    if rc != 0:
        raise IOError(f"native decode failed ({rc}): {path}")
    return out


def load_depth_png(path: str, hw: Tuple[int, int],
                   scale: float = 1e-3) -> np.ndarray:
    """Decode a 16-bit mm depth PNG, resize, convert to metres."""
    lib = load()
    if lib is None:
        raise RuntimeError("native image library unavailable")
    h, w = hw
    out = np.empty((h, w), np.float32)
    rc = lib.mvsdet_load_depth_png(
        path.encode(), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), scale)
    if rc != 0:
        raise IOError(f"native depth decode failed ({rc}): {path}")
    return out


def load_batch_rgb(paths: List[str], hw: Tuple[int, int],
                   n_threads: int = 0) -> np.ndarray:
    """Thread-pooled batch decode+resize -> (n, h, w, 3) uint8."""
    lib = load()
    if lib is None:
        raise RuntimeError("native image library unavailable")
    h, w = hw
    n = len(paths)
    out = np.empty((n, h, w, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if n_threads <= 0:
        n_threads = min(8, os.cpu_count() or 1)
    bad = lib.mvsdet_load_batch_rgb(
        arr, n, h, w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        n_threads)
    if bad:
        raise IOError(f"{bad}/{n} images failed to decode")
    return out
