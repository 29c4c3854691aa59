"""ctypes bridge to the native C++ decode/resize library.

Builds ``native/vadcl_decode.cpp`` on demand (g++ -O3, links libjpeg) into a
per-repo cache; falls back to the PIL path transparently when the toolchain or
libjpeg is unavailable.  See the C++ file for the ABI.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "vadcl_decode.cpp")
_SO = os.path.join(_REPO, "native", "_build", "libvadcl_decode.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = [
        "g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
        _SRC, "-o", _SO, "-ljpeg",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        # missing source (e.g. packaged install shipping only the .so) is
        # treated as not-stale rather than letting getmtime raise
        stale = (
            os.path.exists(_SO)
            and os.path.exists(_SRC)
            and os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        )
        so = _SO if os.path.exists(_SO) and not stale else _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
            batch_args = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
            ]
            lib.vadcl_decode_resize_batch.restype = ctypes.c_int
            lib.vadcl_decode_resize_batch.argtypes = batch_args
            if hasattr(lib, "vadcl_decode_resize_batch_u8"):
                lib.vadcl_decode_resize_batch_u8.restype = ctypes.c_int
                lib.vadcl_decode_resize_batch_u8.argtypes = batch_args[:4] + [
                    ctypes.POINTER(ctypes.c_ubyte),
                    ctypes.c_int,
                ]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return get_lib() is not None


def decode_resize_batch(
    paths: Sequence[str], size: Tuple[int, int], num_threads: int = 8
) -> np.ndarray:
    """paths -> (N, H, W, 3) float32 in [0, 1].  Raises on decode failure."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    n = len(paths)
    h, w = size
    out = np.empty((n, h, w, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.vadcl_decode_resize_batch(
        arr, n, h, w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads,
    )
    if rc != 0:
        raise IOError(f"native decode failed for {paths[rc - 1]!r}")
    return out


def has_u8() -> bool:
    lib = get_lib()
    return lib is not None and hasattr(lib, "vadcl_decode_resize_batch_u8")


def decode_resize_batch_u8(
    paths: Sequence[str], size: Tuple[int, int], num_threads: int = 8
) -> np.ndarray:
    """paths -> (N, H, W, 3) uint8 on the PIL quantization grid (the
    reference pipeline's resize-as-uint8-image point).  Raises on failure."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "vadcl_decode_resize_batch_u8"):
        raise RuntimeError("native u8 decoder unavailable")
    n = len(paths)
    h, w = size
    out = np.empty((n, h, w, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.vadcl_decode_resize_batch_u8(
        arr, n, h, w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        num_threads,
    )
    if rc != 0:
        raise IOError(f"native decode failed for {paths[rc - 1]!r}")
    return out
