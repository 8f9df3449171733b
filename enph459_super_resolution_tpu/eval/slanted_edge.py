"""Slanted-edge MTF (ISO-12233-style) — scripted version of the cal-target
notebooks' analysis (``mono_cal_target/analysis.ipynb`` cell 7).

Pipeline: Sobel edge detection -> centre-line fit -> single-edge cluster ->
perpendicular projection -> 4x oversampled ESF binning -> Hann-windowed
derivative FFT -> MTF.  Per SURVEY.md §7 this stays host-side numpy (the
logic is data-dependent and branchy); only the gradient filters run through
the shared JAX ops.  The per-bin Python loop of the notebook is replaced by
a vectorized bincount.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def slanted_edge_esf(roi: np.ndarray, side: str = "left",
                     band=(-8.0, 10.0), oversample: int = 4,
                     grad_percentile: float = 85.0):
    """Oversampled edge-spread function from one edge of a slanted line.

    Returns (esf_x, esf_y, edge_angle_deg).
    """
    import jax.numpy as jnp
    from ..ops import gaussian_filter, sobel

    roi = np.asarray(roi, dtype=np.float64)
    sm = jnp.asarray(roi)
    smooth = gaussian_filter(sm, 1.5)
    gy = np.asarray(sobel(smooth, axis=0))
    gx = np.asarray(sobel(smooth, axis=1))
    mag = np.sqrt(gx * gx + gy * gy)

    thresh = np.percentile(mag, grad_percentile)
    rs, cs = np.where(mag > thresh)
    if len(rs) < 20:
        raise RuntimeError("too few edge pixels detected")

    # centre-line through ALL edge pixels, in the better-conditioned frame
    use_row_as_x = (rs.max() - rs.min()) >= (cs.max() - cs.min())
    if use_row_as_x:
        m_c, b_c = np.polyfit(rs, cs, 1)
        edge_dist = (cs - m_c * rs - b_c) / np.hypot(1.0, m_c)
    else:
        m_c, b_c = np.polyfit(cs, rs, 1)
        edge_dist = (rs - m_c * cs - b_c) / np.hypot(1.0, m_c)

    mask = edge_dist < 0 if side == "left" else edge_dist > 0
    rs_sel, cs_sel = rs[mask], cs[mask]
    if len(rs_sel) < 10:
        raise RuntimeError(f"too few edge pixels on {side} side")

    nrows, ncols = roi.shape
    rr, cc = np.mgrid[:nrows, :ncols]
    if use_row_as_x:
        m, b = np.polyfit(rs_sel, cs_sel, 1)
        angle = np.degrees(np.arctan2(1, m))
        dist = (cc - m * rr - b) / np.hypot(1.0, m)
    else:
        m, b = np.polyfit(cs_sel, rs_sel, 1)
        angle = np.degrees(np.arctan2(m, 1))
        dist = (rr - m * cc - b) / np.hypot(1.0, m)

    flat_dist = dist.ravel()
    flat_val = roi.ravel()
    keep = (flat_dist > band[0]) & (flat_dist < band[1])
    flat_dist, flat_val = flat_dist[keep], flat_val[keep]

    bin_width = 1.0 / oversample
    bins = np.arange(flat_dist.min(), flat_dist.max() + bin_width, bin_width)
    esf_x = 0.5 * (bins[:-1] + bins[1:])
    idx = np.clip(np.digitize(flat_dist, bins) - 1, 0, len(esf_x) - 1)
    sums = np.bincount(idx, weights=flat_val, minlength=len(esf_x))
    counts = np.bincount(idx, minlength=len(esf_x))
    esf_y = np.where(counts > 0, sums / np.maximum(counts, 1), np.nan)

    valid = ~np.isnan(esf_y)
    if valid.sum() > 2:
        esf_y = np.interp(esf_x, esf_x[valid], esf_y[valid])

    if esf_y[-1] < esf_y[0]:  # orient bright side to the right
        esf_x = -esf_x[::-1]
        esf_y = esf_y[::-1]
    return esf_x, esf_y, float(angle)


def esf_to_mtf(esf_x, esf_y) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """ESF -> LSF (gradient) -> Hann-windowed |FFT| -> normalized MTF.

    Returns (freq [cycles/px of the ESF grid], mtf, lsf).
    """
    lsf = np.gradient(esf_y, esf_x)
    lsf_w = lsf * np.hanning(len(lsf))
    n = len(lsf_w)
    mtf = np.abs(np.fft.fft(lsf_w))[: n // 2]
    if mtf[0] > 0:
        mtf = mtf / mtf[0]
    dx = float(np.mean(np.diff(esf_x)))
    freq = np.fft.fftfreq(n, d=dx)[: n // 2]
    return freq, mtf, lsf


def slanted_edge_mtf(roi, pixel_pitch_mm: float = None, side: str = "left"):
    """Convenience: ROI -> (freq, mtf) with optional cycles/mm conversion
    (``analysis.ipynb`` cell 9: HR pitch = sensor pitch / upsample)."""
    esf_x, esf_y, angle = slanted_edge_esf(roi, side)
    freq, mtf, lsf = esf_to_mtf(esf_x, esf_y)
    if pixel_pitch_mm is not None:
        freq = freq / pixel_pitch_mm
    return {"freq": freq, "mtf": mtf, "lsf": lsf, "esf_x": esf_x,
            "esf_y": esf_y, "angle_deg": angle}
