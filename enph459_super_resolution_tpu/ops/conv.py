"""Convolution primitives on images shaped ``(..., H, W)``.

Replaces the reference's `scipy.signal.fftconvolve` / `scipy.ndimage`
filtering (SURVEY.md §2.9).  Design note: single-channel image convolutions
are a *degenerate* case for `lax.conv_general_dilated` on TPU (a trailing
feature dim of 1 gets lane-padded to 128 — measured 128x memory blowup), so
small kernels are instead unrolled at trace time into weighted sums of
strided slices.  Each tap is a VPU elementwise multiply-add over a shifted
view; XLA fuses the whole tap sum into one bandwidth-bound kernel with zero
layout padding, which is exactly how a TPU wants to see a 7x7 or 1x41
filter.  Kernel values are baked in as scalar constants (they are static:
PSFs and spline-phase kernels are fixed at trace time).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _kernel_scalars(kernel) -> np.ndarray:
    """Static host-side kernel values (must not be a traced array)."""
    k = np.asarray(kernel, dtype=np.float64)
    return k


def correlate1d(x, kernel, axis: int, stride: int = 1):
    """VALID 1-D correlation along ``axis``: ``out[i] = sum_j k[j] x[i*s+j]``.

    Unrolled tap sum over strided slices; ``kernel`` must be static
    (numpy).  Taps with zero weight are skipped.
    """
    axis = axis % x.ndim
    k = _kernel_scalars(kernel)
    length = k.shape[0]
    out_len = (x.shape[axis] - length) // stride + 1
    acc = None
    for j in range(length):
        kj = float(k[j])
        if kj == 0.0:
            continue
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(j, j + (out_len - 1) * stride + 1, stride)
        term = kj * x[tuple(sl)]
        acc = term if acc is None else acc + term
    if acc is None:  # all-zero kernel
        shape = list(x.shape)
        shape[axis] = out_len
        acc = jnp.zeros(shape, dtype=x.dtype)
    return acc


def correlate2d_same(x, kernel, strides=(1, 1)):
    """SAME (zero-padded) 2-D correlation of (..., H, W) with a static 2-D
    ``kernel``, unrolled into a fused tap sum."""
    k = _kernel_scalars(kernel)
    kh, kw = k.shape
    pad = [(0, 0)] * (x.ndim - 2) + [(kh // 2, (kh - 1) // 2),
                                     (kw // 2, (kw - 1) // 2)]
    xp = jnp.pad(x, pad)
    h, w = x.shape[-2], x.shape[-1]
    sy, sx = strides
    oh = (h - 1) // sy + 1
    ow = (w - 1) // sx + 1
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            kv = float(k[dy, dx])
            if kv == 0.0:
                continue
            term = kv * xp[..., dy:dy + (oh - 1) * sy + 1:sy,
                           dx:dx + (ow - 1) * sx + 1:sx]
            acc = term if acc is None else acc + term
    if acc is None:
        acc = jnp.zeros(x.shape[:-2] + (oh, ow), dtype=x.dtype)
    return acc


def conv2d_same(x, kernel):
    """True 2-D convolution (kernel flipped), SAME padding with zeros.

    Drop-in for ``scipy.signal.fftconvolve(x, kernel, mode='same')`` as used
    for PSF blur in the reference (``mono_barcodes/run_sr.py:188-189``) —
    direct evaluation; a 7×7 kernel is ~50 MACs/pixel, far below the FFT
    crossover, and avoids fftconvolve's rounding noise.
    """
    kernel = _kernel_scalars(kernel)
    return correlate2d_same(x, kernel[::-1, ::-1])


@functools.lru_cache(maxsize=None)
def gaussian_kernel_1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """SciPy-compatible 1-D Gaussian kernel (``ndimage.gaussian_filter``)."""
    radius = int(truncate * float(sigma) + 0.5)
    xs = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (xs / float(sigma)) ** 2)
    return k / k.sum()


def gaussian_filter(x, sigma: float, mode: str = "reflect", truncate: float = 4.0):
    """Separable Gaussian blur matching ``scipy.ndimage.gaussian_filter``.

    Used for pinhole peak finding (reference
    ``data_collection/psf_mtf_utils.py:42-45``).
    """
    from .resample import _PAD_MODE  # shared mode-name mapping

    k = gaussian_kernel_1d(float(sigma), truncate)
    radius = (len(k) - 1) // 2
    pad = [(0, 0)] * x.ndim
    pad[-2] = (radius, radius)
    pad[-1] = (radius, radius)
    xp = jnp.pad(x, pad, mode=_PAD_MODE[mode])
    xp = correlate1d(xp, k, axis=x.ndim - 2)
    xp = correlate1d(xp, k, axis=x.ndim - 1)
    return xp


def sobel(x, axis: int = -1, mode: str = "reflect"):
    """``scipy.ndimage.sobel`` equivalent (derivative × smoothing kernels)."""
    from .resample import _PAD_MODE

    deriv = np.array([-1.0, 0.0, 1.0])  # correlate1d is a correlation: no flip
    smooth = np.array([1.0, 2.0, 1.0])
    axis = axis % x.ndim
    pad = [(0, 0)] * x.ndim
    pad[-2] = (1, 1)
    pad[-1] = (1, 1)
    xp = jnp.pad(x, pad, mode=_PAD_MODE[mode])
    if axis == x.ndim - 1:
        xp = correlate1d(xp, deriv, axis=x.ndim - 1)
        xp = correlate1d(xp, smooth, axis=x.ndim - 2)
    else:
        xp = correlate1d(xp, deriv, axis=x.ndim - 2)
        xp = correlate1d(xp, smooth, axis=x.ndim - 1)
    return xp


def laplacian(x):
    """3×3 Laplacian (OpenCV ``cv2.Laplacian`` ksize=1 kernel), zero-padded.

    Focus metric building block (reference
    ``calibration_autofocus/calibrate_autofocus.py:36``).
    """
    k = np.array([[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]])
    return correlate2d_same(x, k)
