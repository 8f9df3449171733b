"""ctypes binding for the native C++ PNG loader (``native/png_loader.cpp``).

Falls back to ``None`` (caller uses PIL) when the shared library has not
been built.  Build with ``python -m enph459_super_resolution_tpu.native.build``.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "libsrpng.so")
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.srpng_load.restype = ctypes.c_int
    lib.srpng_load.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),  # height
        ctypes.POINTER(ctypes.c_int),  # width
        ctypes.POINTER(ctypes.c_int),  # channels
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.srpng_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    _LIB = lib
    return _LIB


def load(path: str):
    """Decode a PNG via libpng; returns uint8 array (H, W[, C]) or None."""
    lib = _load_lib()
    if lib is None or not path.lower().endswith(".png"):
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    buf = ctypes.POINTER(ctypes.c_uint8)()
    rc = lib.srpng_load(path.encode(), ctypes.byref(h), ctypes.byref(w),
                        ctypes.byref(c), ctypes.byref(buf))
    if rc != 0:
        return None
    try:
        n = h.value * w.value * c.value
        arr = np.ctypeslib.as_array(buf, shape=(n,)).copy()
    finally:
        lib.srpng_free(buf)
    arr = arr.reshape(h.value, w.value, c.value)
    if c.value == 1:
        arr = arr[:, :, 0]
    return arr


def available() -> bool:
    return _load_lib() is not None
