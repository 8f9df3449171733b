"""Image quality metrics: PSNR, SSIM, Michelson local contrast.

PSNR/SSIM serve the BASELINE.json parity harness (Set5/Set14 +/-0.05 dB);
``local_contrast`` replicates the cal-target notebooks' cross-section
analysis (``mono_cal_target/analysis.ipynb`` cell 4).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def psnr(pred, target, max_val: float = 255.0):
    """Peak signal-to-noise ratio in dB over the full array."""
    pred = jnp.asarray(pred, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    mse = jnp.mean(jnp.square(pred - target))
    return 10.0 * jnp.log10(max_val * max_val / jnp.maximum(mse, 1e-12))


@functools.lru_cache(maxsize=None)
def _ssim_window(size: int, sigma: float) -> np.ndarray:
    xs = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-0.5 * (xs / sigma) ** 2)
    g /= g.sum()
    return g


def ssim(pred, target, max_val: float = 255.0, win_size: int = 11,
         sigma: float = 1.5, k1: float = 0.01, k2: float = 0.03):
    """Mean structural similarity (Wang et al. 2004): 11x11 Gaussian window
    (sigma 1.5), valid-region mean — the standard SR-paper protocol.

    Accepts (H, W), (H, W, C) or batched (..., H, W[, C]); channels and
    batch are averaged.
    """
    from ..ops.conv import correlate1d

    pred = jnp.asarray(pred, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    if pred.ndim >= 3 and pred.shape[-1] in (1, 3, 4):  # move channels out
        pred = jnp.moveaxis(pred, -1, 0)
        target = jnp.moveaxis(target, -1, 0)

    g = _ssim_window(win_size, sigma)

    def filt(x):
        x = correlate1d(x, g, axis=x.ndim - 2)
        return correlate1d(x, g, axis=x.ndim - 1)

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    mu_x = filt(pred)
    mu_y = filt(target)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sig_xx = filt(pred * pred) - mu_xx
    sig_yy = filt(target * target) - mu_yy
    sig_xy = filt(pred * target) - mu_xy
    s = ((2 * mu_xy + c1) * (2 * sig_xy + c2)) / (
        (mu_xx + mu_yy + c1) * (sig_xx + sig_yy + c2))
    return jnp.mean(s)


def local_contrast(profile, window: int = 20):
    """Sliding-window Michelson contrast ``(max-min)/(max+min)`` along a
    1-D profile (``mono_cal_target/analysis.ipynb`` cell 4 semantics: the
    window is ``profile[i-w//2 : i+w//2]``, zero outside the valid span),
    vectorized instead of the notebook's Python loop."""
    profile = np.asarray(profile, dtype=np.float64)
    n = len(profile)
    hw = window // 2
    out = np.zeros(n)
    if n < 2 * hw:
        return out
    win = np.lib.stride_tricks.sliding_window_view(profile, 2 * hw)
    mx = win.max(axis=1)
    mn = win.min(axis=1)
    out[hw:n - hw] = ((mx - mn) / (mx + mn + 1e-9))[:n - 2 * hw]
    return out


def y_channel(img_rgb):
    """ITU-R BT.601 luma (the SR-paper convention for PSNR/SSIM on Y)."""
    img_rgb = jnp.asarray(img_rgb, jnp.float32)
    w = jnp.asarray([65.481, 128.553, 24.966], jnp.float32) / 255.0
    return jnp.tensordot(img_rgb, w, axes=[[-1], [0]]) + 16.0


def log_spectral_distance(pred, target, n_bins: int = 32):
    """L1 distance between radially-averaged log-amplitude spectra.

    A distribution-level sharpness/texture metric for the perception-
    distortion regime: an L1/MMSE-optimal SR prediction suppresses the
    stochastic high-frequency band entirely (its conditional mean is ~0),
    which PSNR *rewards* but leaves a large gap in the amplitude spectrum;
    a generative term that restores plausible texture closes that gap even
    though the texture is wrong pixel-for-pixel.  Both inputs are 2-D
    (e.g. the Y channel); returns a scalar (mean |Δ log-amplitude| over
    ``n_bins`` radial frequency bins up to Nyquist).
    """
    pred = jnp.asarray(pred, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    h, w = pred.shape[-2], pred.shape[-1]
    fy = jnp.fft.fftfreq(h)[:, None]
    fx = jnp.fft.rfftfreq(w)[None, :]
    r = jnp.hypot(fy, fx)
    idx = jnp.clip((r / 0.5 * n_bins).astype(jnp.int32), 0, n_bins - 1)

    def curve(x):
        amp = jnp.abs(jnp.fft.rfft2(x))
        sums = jnp.zeros(n_bins).at[idx.ravel()].add(amp.ravel())
        cnts = jnp.zeros(n_bins).at[idx.ravel()].add(1.0)
        return jnp.log(sums / jnp.maximum(cnts, 1.0) + 1e-6)

    return jnp.mean(jnp.abs(curve(pred) - curve(target)))


def shave_border(img, border: int):
    """Crop ``border`` pixels all around (standard before SR metrics)."""
    if border == 0:
        return img
    return img[..., border:-border, border:-border] \
        if img.ndim == 2 or img.shape[-1] > 4 \
        else img[..., border:-border, border:-border, :]
