"""TPU-native image resampling / convolution / FFT primitives.

This package is the foundation of the framework: everything the reference
stack obtained from `scipy.ndimage` / `scipy.signal` C code (order-3 spline
shift & zoom, FFT convolution, Gaussian/Sobel/Laplacian filtering) is
re-designed here as XLA-friendly convolutions and banded matmuls so the MXU
and VPU do the work.  Reference behaviors replicated (see SURVEY.md §2.9):

  * ``scipy.ndimage.shift(order=3, mode='nearest')``   -> :func:`spline_shift`
  * ``scipy.ndimage.zoom(order=3)``                    -> :func:`spline_zoom`
  * ``scipy.signal.fftconvolve(mode='same')``          -> :func:`conv2d_same`
  * ``scipy.ndimage.gaussian_filter``                  -> :func:`gaussian_filter`
  * ``scipy.ndimage.sobel`` / ``cv2.Laplacian``        -> :func:`sobel` / :func:`laplacian`
"""

from .resample import (
    CUBIC_POLE,
    bspline_prefilter_kernel,
    cubic_bspline_weights,
    shift_kernel_1d,
    spline_shift,
    spline_coefficients,
    spline_map_coordinates_separable,
    spline_zoom,
    zoom_coords,
)
from .conv import (
    conv2d_same,
    correlate2d_same,
    correlate1d,
    gaussian_filter,
    gaussian_kernel_1d,
    laplacian,
    sobel,
)

__all__ = [
    "CUBIC_POLE",
    "bspline_prefilter_kernel",
    "cubic_bspline_weights",
    "shift_kernel_1d",
    "spline_shift",
    "spline_coefficients",
    "spline_map_coordinates_separable",
    "spline_zoom",
    "zoom_coords",
    "conv2d_same",
    "correlate2d_same",
    "correlate1d",
    "gaussian_filter",
    "gaussian_kernel_1d",
    "laplacian",
    "sobel",
]
