"""Host-side image IO and channel extraction.

PNG decode/encode stays on host (PIL, or the native C++ loader in
``native/`` when built); normalization / channel extraction / stacking runs
on device.  Reference behaviors: ``load_gray`` (RGB-mean to gray,
``mono_barcodes/run_sr.py:84-86``) and RGGB red-plane extraction
(``rgb_barcodes/run_sr.py:97-99``).
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def load_image(path: str, dtype=np.float32) -> np.ndarray:
    """Decode an image file to a float array (0..255 scale), preserving
    channels.  >8-bit sources are scaled down to match the native libpng
    path (png_set_scale_16), so results are identical whether or not the
    C++ loader is built."""
    from ..native import png_loader  # optional C++ fast path

    arr = png_loader.load(path)
    if arr is None:
        arr = np.asarray(Image.open(path))
        if arr.dtype == np.uint16 or (arr.dtype.kind in "iu"
                                      and arr.dtype.itemsize > 1):
            arr = (arr.astype(np.float64) * (255.0 / 65535.0))
    return arr.astype(dtype)


def load_gray(path: str, dtype=np.float32) -> np.ndarray:
    """Float grayscale: RGB images are channel-averaged (reference parity)."""
    img = load_image(path, dtype=np.float64)
    if img.ndim == 3:
        img = img.mean(axis=2)
    return img.astype(dtype)


def load_gray_batch(paths, dtype=np.float32, n_threads: int = 8):
    """Batch grayscale decode via the native threaded loader when built
    (falls back to per-file PIL)."""
    from ..native import png_loader

    if png_loader.available() and all(p.lower().endswith(".png")
                                      for p in paths):
        arrs = png_loader.load_batch(list(paths), n_threads=n_threads)
        out = []
        for p, arr in zip(paths, arrs):
            if arr is None:
                raise FileNotFoundError(f"failed to decode {p}")
            a = arr.astype(np.float64)
            if a.ndim == 3:
                a = a.mean(axis=2)
            out.append(a.astype(dtype))
        return out
    return [load_gray(p, dtype) for p in paths]


def extract_red(img: np.ndarray, row_offset: int = 0, col_offset: int = 0):
    """Red plane of an RGGB Bayer mosaic: even rows / even cols by default."""
    return img[..., row_offset::2, col_offset::2]


def save_png(img: np.ndarray, path: str) -> None:
    """Save a uint8 (or clip-truncated float, reference parity) image.

    Uses the native libpng writer when built (PNG is lossless so pixel
    content is identical): PIL's default encode of one 3072x4096 HR frame
    costs ~2 s on this 1-core host — several times the whole TPU solve —
    while the native zlib-1/SUB encode is ~5-8x faster."""
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    from ..native import png_loader

    if not png_loader.save(path, img):
        Image.fromarray(img).save(path)
