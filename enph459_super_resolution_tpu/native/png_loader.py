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
    lib.srpng_load_batch.restype = ctypes.c_int
    lib.srpng_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    if hasattr(lib, "srpng_write"):  # older prebuilt .so may lack it
        lib.srpng_write.restype = ctypes.c_int
        lib.srpng_write.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
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


def load_batch(paths, n_threads: int = 8):
    """Decode many PNGs with the native worker pool.

    Returns a list of uint8 arrays (None for failures), preserving order.
    """
    lib = _load_lib()
    if lib is None:
        return None
    n = len(paths)
    if n == 0:
        return []
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    hs = (ctypes.c_int * n)()
    ws = (ctypes.c_int * n)()
    cs = (ctypes.c_int * n)()
    bufs = (ctypes.POINTER(ctypes.c_uint8) * n)()
    lib.srpng_load_batch(
        ctypes.cast(c_paths, ctypes.POINTER(ctypes.c_char_p)), n,
        int(n_threads), hs, ws, cs, bufs)
    out = []
    for i in range(n):
        if not bufs[i]:
            out.append(None)
            continue
        try:
            total = hs[i] * ws[i] * cs[i]
            arr = np.ctypeslib.as_array(bufs[i], shape=(total,)).copy()
        finally:
            lib.srpng_free(bufs[i])
        arr = arr.reshape(hs[i], ws[i], cs[i])
        if cs[i] == 1:
            arr = arr[:, :, 0]
        out.append(arr)
    return out


def save(path: str, img: "np.ndarray", compress_level: int = 1) -> bool:
    """Encode a uint8 (H, W[, C]) array via libpng; ~5-8x faster than PIL's
    default encode on this 1-core host (the pipeline's dominant host cost).
    Returns False (caller falls back to PIL) when unavailable."""
    lib = _load_lib()
    if lib is None or not hasattr(lib, "srpng_write"):
        return False
    arr = np.ascontiguousarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        c = 1
    elif arr.ndim == 3 and arr.shape[-1] in (1, 2, 3, 4):
        h, w, c = arr.shape
    else:
        return False
    rc = lib.srpng_write(
        path.encode(), arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(h), int(w), int(c), int(compress_level))
    return rc == 0


def available() -> bool:
    return _load_lib() is not None
