"""Native (C++) host-side kernels for the input pipeline.

Builds libcrop_resize.so on first use (g++ -O3 -fopenmp) and exposes it
via ctypes. Falls back to None when no compiler is available — callers
use the PIL/numpy path then.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "crop_resize.cpp")
_LIB = os.path.join(_HERE, "libcrop_resize.so")

_lib = None
_tried = False


def _build():
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        _SRC, "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.crop_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        lib.channel_gain_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def crop_resize_batch(imgs: np.ndarray, bboxes: np.ndarray, out_size: int):
    """B,H,W,3 uint8 + B,4 float boxes -> B,S,S,3 uint8 (or None if no lib)."""
    lib = get_lib()
    if lib is None:
        return None
    imgs = np.ascontiguousarray(imgs, np.uint8)
    bboxes = np.ascontiguousarray(bboxes, np.float32)
    B, H, W, _ = imgs.shape
    out = np.empty((B, out_size, out_size, 3), np.uint8)
    lib.crop_resize_batch(
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        B, H, W,
        bboxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_size,
    )
    return out


def channel_gain_batch(imgs: np.ndarray, gains: np.ndarray):
    """In-place per-channel gains on B,H,W,3 uint8. Returns imgs or None."""
    lib = get_lib()
    if lib is None:
        return None
    imgs = np.ascontiguousarray(imgs, np.uint8)
    gains = np.ascontiguousarray(gains, np.float32)
    B, H, W, _ = imgs.shape
    lib.channel_gain_batch(
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        B, H, W,
        gains.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return imgs
