"""ctypes binding for the native batch PNG decoder (native/decoder.cpp).

The C++ thread pool decodes a whole multi-view batch concurrently straight
into one (N, H, W, C) uint8 block — the framework's IO runtime, replacing
per-call cv2 decode from Python workers. Falls back gracefully when the
shared library hasn't been built (``native/build.sh``).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libmapdecode.so")
_lib = None


def _try_build() -> bool:
    """Best-effort on-demand build from the vendored C++ source."""
    import shutil
    import subprocess

    src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        "native", "decoder.cpp",
    )
    gxx = shutil.which("g++")
    if not (gxx and os.path.exists(src)):
        return False
    try:
        subprocess.run(
            [gxx, "-O2", "-fPIC", "-shared", "-std=c++17", src, "-lpng",
             "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _try_build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.map_png_info.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.map_png_info.restype = ctypes.c_int
    lib.map_decode_png.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.map_decode_png.restype = ctypes.c_int
    lib.map_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
    ]
    lib.map_decode_batch.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def png_info(path: str) -> tuple[int, int, int]:
    """(width, height, channels) of a PNG."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder not built (run native/build.sh)")
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    c = ctypes.c_int32()
    rc = lib.map_png_info(path.encode(), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(c))
    if rc != 0:
        raise IOError(f"png_info({path}) failed with code {rc}")
    return w.value, h.value, c.value


def decode_image(path: str) -> np.ndarray:
    """Decode one PNG to an (H, W, C) uint8 RGB(A) array."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder not built (run native/build.sh)")
    w, h, c = png_info(path)
    out = np.empty((h, w, c), dtype=np.uint8)
    wo = ctypes.c_int32()
    ho = ctypes.c_int32()
    co = ctypes.c_int32()
    rc = lib.map_decode_png(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.nbytes,
        ctypes.byref(wo), ctypes.byref(ho), ctypes.byref(co),
    )
    if rc != 0:
        raise IOError(f"decode_image({path}) failed with code {rc}")
    return out


def decode_batch(paths, height: int, width: int, channels: int = 3,
                 nthreads: int = 0) -> np.ndarray:
    """Concurrently decode same-geometry PNGs into one (N, H, W, C) block."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder not built (run native/build.sh)")
    n = len(paths)
    out = np.empty((n, height, width, channels), dtype=np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    stride = height * width * channels
    rc = lib.map_decode_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        stride, width, height, channels, nthreads,
    )
    if rc != 0:
        raise IOError(f"decode_batch failed with code {rc}")
    return out
