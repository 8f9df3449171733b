"""Order-3 (cubic) B-spline resampling, TPU-first.

The reference pipeline leans on ``scipy.ndimage.shift`` / ``zoom`` with
``order=3`` for every sub-pixel operation (forward model, back-projection,
shift-and-add, bicubic upsample — see reference ``mono_barcodes/run_sr.py``
lines 192-218).  SciPy implements these as sequential IIR recursions in C.
That translates terribly to a TPU, so this module re-derives the math into
forms XLA tiles well:

1.  **Prefilter as a truncated FIR.**  The cubic direct B-spline transform is
    the inverse of the filter ``B(z) = (z + 4 + z^-1) / 6``; its exact impulse
    response is ``h[n] = sqrt(3) * z1^|n|`` with pole ``z1 = sqrt(3) - 2``
    (|z1| ~ 0.268).  The tail decays below f32 epsilon in < 20 taps and below
    f64 epsilon in < 40, so the IIR is *exactly* (to machine precision) a
    short symmetric FIR.  Boundary conditions become plain array padding.

2.  **Uniform shift as a separable 4-tap conv.**  A constant sub-pixel shift
    samples every output pixel at the same fractional phase, so evaluation is
    a fixed 4-tap kernel per axis; fused with the prefilter FIR it is one
    ~40-tap separable convolution per axis — bandwidth-bound VPU work that
    XLA fuses with neighbouring elementwise ops.

3.  **Arbitrary-grid sampling as a banded matmul.**  ``zoom`` (and any
    map_coordinates-style separable resampling) uses per-row sampling
    matrices with 4 non-zeros per row, applied as dense matmuls — which is
    exactly how the MXU wants to see a resize.  Matrices are built host-side
    in float64 at trace time (coordinates are static) and baked into the
    graph as constants.

SciPy-compat notes (empirically validated in tests/test_resample.py):

* SciPy mode names map to padding: ``nearest``-> 'edge', ``mirror``->
  'reflect', ``reflect`` -> 'symmetric', ``grid-wrap`` -> 'wrap'.
* SciPy's geometric transforms (shift/zoom/map_coordinates) pre-pad modes
  'nearest' and 'grid-constant' with 12 edge values before prefiltering
  (``scipy.ndimage._interpolation._prepad_for_spline_filter``);
  :func:`spline_shift` replicates this, achieving bit-parity with SciPy
  everywhere including borders.
* SciPy stores coefficients only for indices [0, N); out-of-range spline
  evaluation taps are index-mapped back into range per mode.  The matmul
  path replicates SciPy's index mapping exactly.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .conv import correlate1d

# Pole of the cubic B-spline direct transform.
CUBIC_POLE = math.sqrt(3.0) - 2.0

# SciPy boundary-mode name -> numpy/jnp pad mode *for the prefilter*.
# Determined empirically against scipy.ndimage.spline_filter1d: SciPy's
# prefilter init conditions for mode='nearest' correspond to SYMMETRIC
# (whole-sample reflect) extension, not constant extension; 'constant' and
# 'grid-constant' prefilter with mirror extension.  Out-of-range *evaluation*
# taps are then index-mapped per mode (clamped for 'nearest') — see
# :func:`_map_index`.
_PAD_MODE = {
    "nearest": "symmetric",
    "mirror": "reflect",
    "reflect": "symmetric",
    "grid-wrap": "wrap",
    "wrap": "wrap",
    "constant": "reflect",
}


def _prefilter_halfwidth(dtype) -> int:
    """Taps needed for the FIR prefilter to reach machine precision."""
    eps = float(jnp.finfo(dtype).eps)
    # |h[n]| = sqrt(3) |z1|^n ; solve sqrt(3)|z1|^K < eps/8 for margin.
    k = math.ceil(math.log(eps / (8.0 * math.sqrt(3.0))) / math.log(abs(CUBIC_POLE)))
    return max(k, 8)


@functools.lru_cache(maxsize=None)
def bspline_prefilter_kernel(dtype_name: str = "float32") -> np.ndarray:
    """Symmetric FIR impulse response of the cubic direct B-spline transform.

    ``h[n] = sqrt(3) * (sqrt(3)-2)^|n|``, truncated at the dtype's epsilon.
    Convolving a signal with this kernel yields the spline coefficients c
    such that ``sum_k c[k] B3(x - k)`` interpolates the signal.
    """
    dtype = np.dtype(dtype_name)
    hw = _prefilter_halfwidth(dtype)
    n = np.abs(np.arange(-hw, hw + 1, dtype=np.float64))
    h = math.sqrt(3.0) * (CUBIC_POLE ** n)
    # Normalize the truncated kernel to exactly unit DC gain so constant
    # signals are reproduced bit-exactly.
    h /= h.sum()
    return h


def cubic_bspline_weights(t: np.ndarray) -> np.ndarray:
    """4 interpolation weights at fractional offset ``t`` in [0, 1).

    Returns array (..., 4) for taps at offsets (-1, 0, +1, +2) relative to
    ``floor(sample_position)``.
    """
    t = np.asarray(t, dtype=np.float64)
    t2 = t * t
    t3 = t2 * t
    omt = 1.0 - t
    w0 = omt * omt * omt / 6.0
    w1 = 2.0 / 3.0 - t2 + 0.5 * t3
    w3 = t3 / 6.0
    w2 = 1.0 - (w0 + w1 + w3)
    return np.stack([w0, w1, w2, w3], axis=-1)


@functools.lru_cache(maxsize=None)
def shift_kernel_1d(delta: float, dtype_name: str = "float32"):
    """Combined prefilter+sampling correlation kernel for a uniform 1-D shift.

    Replicates ``scipy.ndimage.shift(x, delta, order=3)`` along one axis:
    ``out[i] = spline(x)(i - delta)``.

    Returns ``(kernel, offset)`` (numpy float64) such that
    ``out[i] = sum_j kernel[j] * x_ext[i + offset + j]`` where ``x_ext`` is
    the boundary-extended signal.
    """
    h = bspline_prefilter_kernel(dtype_name)
    hw = (len(h) - 1) // 2
    s = -float(delta)
    m = math.floor(s)
    t = s - m
    w = cubic_bspline_weights(np.float64(t))  # (4,)
    # Correlation composition: offset adds, kernels convolve.
    g = np.convolve(h, w)
    offset = (m - 1) + (-hw)
    return g, offset


def _apply_axis_kernel(x, kernel_np, offset, axis, mode, out_len, stride=1):
    """Correlate ``x`` along ``axis`` with an extended-signal kernel.

    out[i] = sum_j kernel[j] * ext(x)[i*stride + offset + j],
    for i in [0, out_len).
    """
    length = len(kernel_np)
    pad_left = max(0, -offset)
    pad_right = max(0, (out_len - 1) * stride + offset + length - 1 - (x.shape[axis] - 1))
    pad = [(0, 0)] * x.ndim
    pad[axis] = (pad_left, pad_right)
    xp = jnp.pad(x, pad, mode=_PAD_MODE[mode])
    start = offset + pad_left
    # Slice so the first valid window lands on output index 0.
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(start, start + (out_len - 1) * stride + length)
    xp = xp[tuple(sl)]
    return correlate1d(xp, kernel_np, axis=axis, stride=stride)


def spline_shift(x, shift, mode: str = "nearest", out_shape=None, strides=(1, 1)):
    """Sub-pixel shift of the trailing two axes by a uniform ``(dy, dx)``.

    TPU-native equivalent of
    ``scipy.ndimage.shift(x, (dy, dx), order=3, mode='nearest')``
    (reference ``mono_barcodes/run_sr.py:194,207,217``): one fused ~40-tap
    separable correlation per axis, with optional output striding so the
    forward model's ``[::f, ::f]`` decimation fuses into the final conv.

    Args:
      x: array (..., H, W).
      shift: static (dy, dx) Python floats.
      mode: scipy boundary mode name.
      out_shape: optional (H_out, W_out) before striding (defaults to input).
      strides: (sy, sx) decimation applied to the *output* grid, i.e.
        ``result[i, j] = shifted[i * sy, j * sx]``.

    Returns array (..., H_out/sy, W_out/sx).
    """
    dy, dx = float(shift[0]), float(shift[1])
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = out_shape if out_shape is not None else (h_in, w_in)
    sy, sx = strides
    dtype_name = str(x.dtype)

    # SciPy's shift()/geometric transforms pre-pad modes 'nearest' and
    # 'grid-constant' with NPAD=12 edge values before spline-prefiltering
    # (scipy _interpolation._prepad_for_spline_filter); beyond the pre-pad
    # the prefilter's own (symmetric) init conditions apply.  Replicating
    # the pre-pad makes this path bit-parity with SciPy everywhere,
    # including borders, for |shift| < NPAD - 3.
    npad = 12 if mode == "nearest" else 0
    if npad:
        if max(abs(dy), abs(dx)) > npad - 4:
            npad = int(max(abs(dy), abs(dx))) + 16
        pad = [(0, 0)] * x.ndim
        pad[-2] = (npad, npad)
        pad[-1] = (npad, npad)
        x = jnp.pad(x, pad, mode="edge")

    ky, oy = shift_kernel_1d(dy, dtype_name)
    kx, ox = shift_kernel_1d(dx, dtype_name)
    n_y = -(-h_out // sy)
    n_x = -(-w_out // sx)
    x = _apply_axis_kernel(x, ky, oy + npad, x.ndim - 2, mode, n_y, stride=sy)
    x = _apply_axis_kernel(x, kx, ox + npad, x.ndim - 1, mode, n_x, stride=sx)
    return x


# ---------------------------------------------------------------------------
# Arbitrary-coordinate separable sampling (matmul path)
# ---------------------------------------------------------------------------


def spline_coefficients(x, mode: str = "nearest", axes=(-2, -1)):
    """Cubic spline coefficients of ``x`` (SciPy ``spline_filter`` parity).

    Computed with the truncated-FIR prefilter on a boundary-extended copy,
    which equals SciPy's exact-IIR-with-boundary-init result to machine
    precision (validated in tests).
    """
    dtype_name = str(x.dtype)
    h = bspline_prefilter_kernel(dtype_name)
    hw = (len(h) - 1) // 2
    for ax in axes:
        ax = ax % x.ndim
        x = _apply_axis_kernel(x, h, -hw, ax, mode, x.shape[ax])
    return x


@functools.lru_cache(maxsize=None)
def _sampling_matrix(in_size: int, coords_key, mode: str, dtype_name: str):
    """Dense (out, in) cubic sampling matrix with SciPy tap index-mapping."""
    coords = np.asarray(coords_key, dtype=np.float64)
    j = np.floor(coords).astype(np.int64)
    t = coords - j
    w = cubic_bspline_weights(t)  # (out, 4)
    m = np.zeros((len(coords), in_size), dtype=np.float64)
    rows = np.arange(len(coords))
    for k in range(4):
        idx = j - 1 + k
        idx = _map_index(idx, in_size, mode)
        np.add.at(m, (rows, idx), w[:, k])
    return m.astype(np.dtype(dtype_name))


def _map_index(idx, n, mode):
    """SciPy's out-of-range coefficient index mapping per boundary mode."""
    if mode in ("nearest", "constant"):
        return np.clip(idx, 0, n - 1)
    if mode == "mirror":
        if n == 1:
            return np.zeros_like(idx)
        period = 2 * (n - 1)
        idx = np.abs(idx) % period
        return np.where(idx >= n, period - idx, idx)
    if mode == "reflect":
        period = 2 * n
        idx = np.where(idx < 0, -idx - 1, idx) % period
        return np.where(idx >= n, period - idx - 1, idx)
    if mode in ("wrap", "grid-wrap"):
        return idx % n
    raise ValueError(f"unsupported mode {mode!r}")


def spline_map_coordinates_separable(x, coords_y, coords_x, mode="nearest",
                                     prefilter=True):
    """Separable cubic resampling onto an arbitrary rectangular output grid.

    Equivalent to ``scipy.ndimage.map_coordinates`` on the outer product grid
    ``coords_y × coords_x`` — each axis is a banded (out, in) matmul, which
    maps straight onto the MXU.  ``coords_*`` must be static (numpy) arrays.
    """
    if prefilter:
        x = spline_coefficients(x, mode=mode)
    dtype_name = str(x.dtype)
    my = _sampling_matrix(x.shape[-2], tuple(np.asarray(coords_y, np.float64)),
                          mode, dtype_name)
    mx = _sampling_matrix(x.shape[-1], tuple(np.asarray(coords_x, np.float64)),
                          mode, dtype_name)
    my = jnp.asarray(my)
    mx = jnp.asarray(mx)
    # (..., H, W) -> (..., Hy, W) -> (..., Hy, Wx)
    out = jnp.einsum("oh,...hw->...ow", my, x,
                     precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("...ow,xw->...ox", out, mx,
                     precision=jax.lax.Precision.HIGHEST)
    return out


def zoom_coords(in_size: int, factor: float):
    """SciPy ``ndimage.zoom`` (grid_mode=False) output size + sample coords."""
    out_size = int(round(in_size * factor))
    if out_size <= 1 or in_size <= 1:
        return out_size, np.zeros((max(out_size, 0),), dtype=np.float64)
    step = (in_size - 1) / (out_size - 1)
    return out_size, np.arange(out_size, dtype=np.float64) * step


def spline_zoom(x, factor: float, mode: str = "mirror"):
    """Cubic zoom of the trailing two axes.

    TPU-native equivalent of ``scipy.ndimage.zoom(x, factor, order=3)``
    (reference ``mono_barcodes/run_sr.py:216,315``): endpoint-aligned
    coordinates, evaluated as two banded matmuls.  SciPy's default
    ``mode='constant'`` prefilters with mirror boundaries, which ``mode=
    'mirror'`` here reproduces (validated against SciPy in tests).
    """
    h_out, cy = zoom_coords(x.shape[-2], factor)
    w_out, cx = zoom_coords(x.shape[-1], factor)
    del h_out, w_out
    return spline_map_coordinates_separable(x, cy, cx, mode=mode)
