"""Convolution primitives on images shaped ``(..., H, W)``.

Replaces the reference's `scipy.signal.fftconvolve` / `scipy.ndimage`
filtering (SURVEY.md §2.9) with direct `lax.conv_general_dilated` calls: a
7×7 PSF is far below the FFT crossover, and direct convs let XLA fuse the
surrounding elementwise work and drive the MXU/VPU directly.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_batch(x):
    """(..., H, W) -> (N, 1, H, W) plus a restore function."""
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    n = int(np.prod(lead)) if lead else 1
    xr = x.reshape((n, 1, h, w))
    def restore(y):
        return y.reshape(lead + y.shape[-2:])
    return xr, restore


def correlate1d(x, kernel, axis: int, stride: int = 1):
    """VALID 1-D correlation along ``axis`` of an (..., H, W) array.

    ``out[i] = sum_j kernel[j] * x[i*stride + j]`` along the chosen axis.
    """
    axis = axis % x.ndim
    if axis not in (x.ndim - 2, x.ndim - 1):
        raise ValueError("correlate1d only supports the trailing two axes")
    kernel = jnp.asarray(kernel, dtype=x.dtype)
    length = kernel.shape[0]
    xr, restore = _flatten_batch(x)
    if axis == x.ndim - 2:
        rhs = kernel.reshape((1, 1, length, 1))
        strides = (stride, 1)
    else:
        rhs = kernel.reshape((1, 1, 1, length))
        strides = (1, stride)
    out = jax.lax.conv_general_dilated(
        xr, rhs, window_strides=strides, padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return restore(out)


def correlate2d_same(x, kernel, lhs_dilation=(1, 1), strides=(1, 1)):
    """SAME 2-D correlation of (..., H, W) with a 2-D ``kernel``.

    ``lhs_dilation`` inserts zeros between input pixels (transposed-conv /
    zero-stuffing, used by IBP back-projection), so the reference's
    "zero-stuff then convolve" (``mono_barcodes/run_sr.py:199-209``) becomes
    a single dilated convolution.
    """
    kernel = jnp.asarray(kernel, dtype=x.dtype)
    kh, kw = kernel.shape
    xr, restore = _flatten_batch(x)
    out = jax.lax.conv_general_dilated(
        xr, kernel.reshape((1, 1, kh, kw)),
        window_strides=strides,
        padding=((kh // 2, (kh - 1) // 2), (kw // 2, (kw - 1) // 2)),
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return restore(out)


def conv2d_same(x, kernel):
    """True 2-D convolution (kernel flipped), SAME padding with zeros.

    Drop-in for ``scipy.signal.fftconvolve(x, kernel, mode='same')`` as used
    for PSF blur in the reference (``mono_barcodes/run_sr.py:188-189``) —
    direct evaluation; a 7×7 kernel is ~50 MACs/pixel, far below the FFT
    crossover, and avoids fftconvolve's rounding noise.
    """
    kernel = jnp.asarray(kernel, dtype=x.dtype)
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
    k = jnp.asarray([[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]],
                    dtype=x.dtype)
    return correlate2d_same(x, k)
