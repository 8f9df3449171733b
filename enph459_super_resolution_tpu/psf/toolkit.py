"""PSF/MTF characterization toolkit.

Re-designs the reference's per-image numpy loops
(``data_collection/psf_mtf_utils.py:34-190``,
``calibration_psf/analyze_psf_mtf.py:37-205``) as batched JAX pipelines:
peak finding, MTF-via-FFT, and radial averaging vmap over the whole image
stack in one compiled graph; the 2-D Gaussian fit is a batched
Levenberg-Marquardt in JAX instead of per-image ``scipy.curve_fit``.
Small/branchy pieces (ROI percentile background, crossing interpolation)
stay host-side numpy where a TPU buys nothing.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import gaussian_filter


# ---------------------------------------------------------------------------
# extraction (host-side: tiny ROIs, data-dependent percentiles)
# ---------------------------------------------------------------------------

def find_peak(img, smooth_sigma: float = 2.0) -> Tuple[int, int]:
    """(row, col) of the PSF peak after light Gaussian smoothing
    (``psf_mtf_utils.py:42-45``)."""
    sm = np.asarray(gaussian_filter(jnp.asarray(img, jnp.float32),
                                    smooth_sigma))
    return tuple(int(v) for v in np.unravel_index(sm.argmax(), sm.shape))


def extract_psf(img: np.ndarray, center, radius: int,
                bg_percentile: float = 50.0,
                noise_floor_sigma: Optional[float] = 3.0) -> np.ndarray:
    """Background-subtracted ROI centred on the peak.

    Annulus-percentile background (``psf_mtf_utils.py:48-65``) plus the
    sparse-noise floor at ``noise_floor_sigma`` x background std added by
    ``analyze_psf_mtf.py:66-71`` (pass None to disable, matching the plain
    psf_mtf_utils behavior).
    """
    r, c = center
    h, w = img.shape
    r0, r1 = max(r - radius, 0), min(r + radius + 1, h)
    c0, c1 = max(c - radius, 0), min(c + radius + 1, w)
    roi = np.array(img[r0:r1, c0:c1], dtype=np.float64)

    yy, xx = np.ogrid[: roi.shape[0], : roi.shape[1]]
    cy, cx = roi.shape[0] // 2, roi.shape[1] // 2
    annulus = ((yy - cy) ** 2 + (xx - cx) ** 2) >= (radius * 0.6) ** 2
    bg = np.percentile(roi[annulus], bg_percentile)
    roi -= bg
    roi[roi < 0] = 0
    if noise_floor_sigma is not None:
        bg_std = float(np.std(roi[annulus]))
        if bg_std > 0:
            roi[roi < noise_floor_sigma * bg_std] = 0
    return roi


def subpixel_centre(psf) -> Tuple[float, float]:
    """Thresholded centre of mass (``psf_mtf_utils.py:68-72``)."""
    psf = np.asarray(psf, dtype=np.float64)
    masked = np.where(psf > psf.max() * 0.1, psf, 0.0)
    total = masked.sum()
    yy, xx = np.mgrid[: psf.shape[0], : psf.shape[1]]
    return float((masked * yy).sum() / total), float((masked * xx).sum() / total)


# ---------------------------------------------------------------------------
# radial statistics (vectorized; JAX for batched stacks)
# ---------------------------------------------------------------------------

def radial_average(data, center=None, max_radius: Optional[int] = None):
    """Azimuthal mean profile, integer-truncated radii bins
    (``psf_mtf_utils.py:75-96``), computed with one bincount instead of a
    per-radius mask loop.  Returns (radii, profile)."""
    data = np.asarray(data, dtype=np.float64)
    h, w = data.shape
    cy, cx = (h / 2.0, w / 2.0) if center is None else center
    yy, xx = np.mgrid[:h, :w]
    r = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2).astype(int)
    if max_radius is None:
        max_radius = int(min(cy, cx, h - cy, w - cx))
    flat_r = r.ravel()
    sums = np.bincount(flat_r, weights=data.ravel(),
                       minlength=max_radius)[:max_radius]
    counts = np.bincount(flat_r, minlength=max_radius)[:max_radius]
    profile = np.where(counts > 0, sums / np.maximum(counts, 1), 0.0)
    return np.arange(max_radius), profile


def _radial_average_dev(data, cy, cx, max_radius: int):
    """Device-side radial mean via segment_sum (fixed bin count)."""
    h, w = data.shape
    yy = jnp.arange(h, dtype=data.dtype)[:, None]
    xx = jnp.arange(w, dtype=data.dtype)[None, :]
    r = jnp.sqrt((xx - cx) ** 2 + (yy - cy) ** 2).astype(jnp.int32)
    r = jnp.minimum(r, max_radius)  # overflow bin
    sums = jax.ops.segment_sum(data.ravel(), r.ravel(),
                               num_segments=max_radius + 1)[:max_radius]
    counts = jax.ops.segment_sum(jnp.ones_like(data).ravel(), r.ravel(),
                                 num_segments=max_radius + 1)[:max_radius]
    return sums / jnp.maximum(counts, 1)


def encircled_energy(profile, radii):
    """Cumulative ring-weighted energy fraction
    (``analyze_psf_mtf.py:251-253``)."""
    ee = np.cumsum(np.asarray(profile) * np.asarray(radii) * 2 * np.pi)
    total = ee[-1] if ee[-1] > 0 else 1.0
    return ee / total


# ---------------------------------------------------------------------------
# MTF (batched on device)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("pad",))
def _mtf_dev(psf_stack, pad: int):
    """Batched |OTF| + radial profile for a stack of PSFs (N, h, w)."""
    n, h, w = psf_stack.shape
    r0, c0 = (pad - h) // 2, (pad - w) // 2
    padded = jnp.zeros((n, pad, pad), psf_stack.dtype)
    padded = padded.at[:, r0:r0 + h, c0:c0 + w].set(psf_stack)
    s = jnp.sum(padded, axis=(1, 2), keepdims=True)
    padded = jnp.where(s > 0, padded / s, padded)
    otf = jnp.fft.fftshift(
        jnp.fft.fft2(jnp.fft.ifftshift(padded, axes=(1, 2))), axes=(1, 2))
    mtf2d = jnp.abs(otf)
    mx = jnp.max(mtf2d, axis=(1, 2), keepdims=True)
    mtf2d = jnp.where(mx > 0, mtf2d / mx, mtf2d)
    prof = jax.vmap(lambda m: _radial_average_dev(
        m, pad / 2.0, pad / 2.0, pad // 2))(mtf2d)
    return mtf2d, prof


def compute_mtf(psf, pixel_pitch_um: Optional[float] = None):
    """MTF from a PSF via zero-padded FFT + radial average
    (``psf_mtf_utils.py:129-163``).

    Returns (freq, mtf_radial, mtf_2d, freq_label, nyquist).  Accepts a
    single (h, w) PSF or a batched (N, h, w) stack (batched outputs).
    """
    psf = np.asarray(psf, dtype=np.float64)
    single = psf.ndim == 2
    stack = psf[None] if single else psf
    pad = max(256, stack.shape[1], stack.shape[2])
    mtf2d, prof = _mtf_dev(jnp.asarray(stack), pad)
    mtf2d, prof = np.asarray(mtf2d), np.asarray(prof)
    freq_cpp = np.arange(pad // 2, dtype=np.float64) / pad
    if pixel_pitch_um is not None:
        freq = freq_cpp / (pixel_pitch_um * 1e-3)
        label, nyquist = "cycles/mm", 1.0 / (2.0 * pixel_pitch_um * 1e-3)
    else:
        freq, label, nyquist = freq_cpp, "cycles/pixel", 0.5
    if single:
        return freq, prof[0], mtf2d[0], label, nyquist
    return freq, prof, mtf2d, label, nyquist


def mtf_at_fraction(freq, mtf, fraction: float = 0.5) -> float:
    """First linear-interpolated crossing below ``fraction``
    (``psf_mtf_utils.py:166-179``)."""
    freq = np.asarray(freq)
    mtf = np.asarray(mtf)
    above = mtf >= fraction
    if not above.any() or above.all():
        return float("nan")
    idx = np.where(np.diff(above.astype(int)) == -1)[0]
    if len(idx) == 0:
        return float("nan")
    i = idx[0]
    f0, f1, m0, m1 = freq[i], freq[i + 1], mtf[i], mtf[i + 1]
    if abs(m1 - m0) < 1e-12:
        return float(f0)
    return float(f0 + (fraction - m0) * (f1 - f0) / (m1 - m0))


# ---------------------------------------------------------------------------
# batched 2-D Gaussian fit (Levenberg-Marquardt in JAX)
# ---------------------------------------------------------------------------

def gauss2d_model(params, xx, yy):
    """Rotated 2-D Gaussian, parameterization per ``psf_mtf_utils.py:99-106``:
    params = (amp, x0, y0, sigma_x, sigma_y, theta, offset)."""
    amp, x0, y0, sx, sy, th, off = params
    a = jnp.cos(th) ** 2 / (2 * sx ** 2) + jnp.sin(th) ** 2 / (2 * sy ** 2)
    b = -jnp.sin(2 * th) / (4 * sx ** 2) + jnp.sin(2 * th) / (4 * sy ** 2)
    c = jnp.sin(th) ** 2 / (2 * sx ** 2) + jnp.cos(th) ** 2 / (2 * sy ** 2)
    dx, dy = xx - x0, yy - y0
    return off + amp * jnp.exp(-(a * dx * dx + 2 * b * dx * dy + c * dy * dy))


def _lm_fit_single(psf, p0, n_iter: int = 40):
    """Levenberg-Marquardt on the 7-param Gaussian; fixed iteration count
    (jit/vmap-friendly: no data-dependent termination)."""
    h, w = psf.shape
    yy, xx = jnp.mgrid[:h, :w]
    xx = xx.astype(psf.dtype)
    yy = yy.astype(psf.dtype)
    target = psf.ravel()

    def residual(p):
        return gauss2d_model(p, xx, yy).ravel() - target

    def body(_, carry):
        p, lam = carry
        r = residual(p)
        jac = jax.jacfwd(residual)(p)  # (npix, 7)
        jtj = jac.T @ jac
        jtr = jac.T @ r
        step = jnp.linalg.solve(jtj + lam * jnp.diag(jnp.diag(jtj)) +
                                1e-12 * jnp.eye(7, dtype=psf.dtype), jtr)
        p_new = p - step
        better = jnp.sum(residual(p_new) ** 2) < jnp.sum(r ** 2)
        p = jnp.where(better, p_new, p)
        lam = jnp.where(better, lam * 0.5, lam * 4.0)
        return p, lam

    p, _ = jax.lax.fori_loop(0, n_iter, body,
                             (p0, jnp.asarray(1e-2, psf.dtype)))
    return p


@functools.partial(jax.jit, static_argnames=("n_iter",))
def _lm_fit_batch(psfs, p0s, n_iter: int = 40):
    return jax.vmap(lambda p, i: _lm_fit_single(p, i, n_iter))(psfs, p0s)


def fit_gaussian_psf(psf):
    """Fit one PSF; returns (params, fit_image) like the reference
    (``psf_mtf_utils.py:109-126``), or (None, None) on failure."""
    params = fit_gaussian_psf_batch(np.asarray(psf)[None])[0]
    if not np.all(np.isfinite(params)):
        return None, None
    h, w = psf.shape
    yy, xx = np.mgrid[:h, :w]
    dt = jnp.zeros(0).dtype if not jax.config.jax_enable_x64 else jnp.float64
    fit = np.asarray(gauss2d_model(jnp.asarray(params, dt),
                                   jnp.asarray(xx, dt), jnp.asarray(yy, dt)))
    return params, fit


def fit_gaussian_psf_batch(psfs) -> np.ndarray:
    """Batched Gaussian fit: (N, h, w) -> (N, 7) params.

    All N fits run as one vmapped LM solve on device.  sigma_x/sigma_y are
    returned as absolute values (the model is even in their sign).
    """
    psfs = np.asarray(psfs, dtype=np.float64)
    n = psfs.shape[0]
    p0s = np.zeros((n, 7))
    for i, p in enumerate(psfs):
        cy, cx = subpixel_centre(p)
        p0s[i] = [p.max(), cx, cy, 2.0, 2.0, 0.0, 0.0]
    params = np.array(_lm_fit_batch(jnp.asarray(psfs), jnp.asarray(p0s)))
    params[:, 3] = np.abs(params[:, 3])
    params[:, 4] = np.abs(params[:, 4])
    # Canonicalize the (sx, sy, theta) <-> (sy, sx, theta +/- pi/2)
    # degeneracy: fold theta into [-pi/4, pi/4), swapping sigmas per fold.
    # (scipy curve_fit leaves the labeling arbitrary; see the reference npz
    # where pos4 sx/sy appear swapped between runs.)
    th = np.mod(params[:, 5] + np.pi / 4, np.pi) - np.pi / 4
    swap = th >= np.pi / 4
    th = np.where(swap, th - np.pi / 2, th)
    sx = np.where(swap, params[:, 4], params[:, 3])
    sy = np.where(swap, params[:, 3], params[:, 4])
    params[:, 3], params[:, 4], params[:, 5] = sx, sy, th
    return params
