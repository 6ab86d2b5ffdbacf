"""ctypes bindings for the native canvas-IO library (JPEG decode + crop/resize).

Loads ``libcanvasio.so`` (building it with ``make`` on first use if a
toolchain is available); falls back gracefully — callers check ``AVAILABLE``
and use the PIL path otherwise.  All calls release the GIL (plain C ABI), so
loader prefetch threads parallelize across host cores.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "libcanvasio.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.canvasio_jpeg_info.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.canvasio_jpeg_info.restype = ctypes.c_int
    lib.canvasio_decode_jpeg.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_int]
    lib.canvasio_decode_jpeg.restype = ctypes.c_int
    lib.canvasio_crop_resize.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_void_p, ctypes.c_int]
    lib.canvasio_crop_resize.restype = None
    lib.canvasio_decode_crop_resize.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_void_p, ctypes.c_int]
    lib.canvasio_decode_crop_resize.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a JPEG byte string to an (H, W, 3) uint8 RGB array."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native canvasio unavailable")
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    if lib.canvasio_jpeg_info(data, len(data), ctypes.byref(w),
                              ctypes.byref(h), ctypes.byref(c)):
        raise ValueError("not a decodable JPEG")
    out = np.empty((h.value, w.value, 3), np.uint8)
    if lib.canvasio_decode_jpeg(data, len(data),
                                out.ctypes.data_as(ctypes.c_void_p),
                                w.value, h.value):
        raise ValueError("JPEG decode failed")
    return out


def crop_resize(img: np.ndarray, left: float, top: float, side: float,
                out_size: int) -> np.ndarray:
    """Bilinear square crop/resize with zero-fill OOB (device-warp semantics)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native canvasio unavailable")
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    assert c == 3
    out = np.empty((out_size, out_size, 3), np.uint8)
    lib.canvasio_crop_resize(img.ctypes.data_as(ctypes.c_void_p), h, w,
                             left, top, side,
                             out.ctypes.data_as(ctypes.c_void_p), out_size)
    return out


def decode_crop_resize(data: bytes, left: float, top: float, side: float,
                       out_size: int) -> np.ndarray:
    """Fused decode + person-crop + resize (one native call, GIL released)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native canvasio unavailable")
    out = np.empty((out_size, out_size, 3), np.uint8)
    if lib.canvasio_decode_crop_resize(data, len(data), left, top, side,
                                       out.ctypes.data_as(ctypes.c_void_p),
                                       out_size):
        raise ValueError("decode_crop_resize failed")
    return out
