"""PSF/MTF toolkit tests: scipy/synthetic parity + real-data golden parity
against the reference's checked-in characterization npz."""

import numpy as np
import pytest
import scipy.ndimage as ndi

from enph459_super_resolution_tpu.psf import toolkit as tk

RNG = np.random.default_rng(11)


def synth_gaussian(h=61, w=61, amp=200.0, x0=30.3, y0=29.6, sx=1.4, sy=0.9,
                   th=0.4, off=2.0, noise=0.5):
    yy, xx = np.mgrid[:h, :w].astype(np.float64)
    a = np.cos(th) ** 2 / (2 * sx ** 2) + np.sin(th) ** 2 / (2 * sy ** 2)
    b = -np.sin(2 * th) / (4 * sx ** 2) + np.sin(2 * th) / (4 * sy ** 2)
    c = np.sin(th) ** 2 / (2 * sx ** 2) + np.cos(th) ** 2 / (2 * sy ** 2)
    g = off + amp * np.exp(-(a * (xx - x0) ** 2 + 2 * b * (xx - x0) * (yy - y0)
                             + c * (yy - y0) ** 2))
    return g + RNG.normal(0, noise, size=(h, w))


def test_find_peak_matches_scipy():
    img = synth_gaussian()
    sm = ndi.gaussian_filter(img, 2.0)
    want = np.unravel_index(sm.argmax(), sm.shape)
    assert tk.find_peak(img) == tuple(int(v) for v in want)


def test_radial_average_matches_naive_loop():
    data = RNG.uniform(size=(40, 44))
    center = (19.3, 22.1)
    radii, prof = tk.radial_average(data, center, 15)
    # naive per-radius loop (the reference's implementation shape)
    yy, xx = np.mgrid[:40, :44]
    r_int = np.sqrt((xx - center[1]) ** 2 + (yy - center[0]) ** 2).astype(int)
    for ri in range(15):
        mask = r_int == ri
        if mask.any():
            assert abs(prof[ri] - data[mask].mean()) < 1e-12


def test_gaussian_fit_recovers_truth_and_matches_curve_fit():
    img = synth_gaussian()
    params, fit = tk.fit_gaussian_psf(img)
    assert params is not None
    amp, x0, y0, sx, sy, th, off = params
    assert abs(x0 - 30.3) < 0.02 and abs(y0 - 29.6) < 0.02
    assert abs(sx - 1.4) < 0.02 and abs(sy - 0.9) < 0.02
    assert abs(th - 0.4) < 0.05
    # against scipy curve_fit on the same data
    from scipy.optimize import curve_fit

    def gauss2d(xy, amp, x0, y0, sigma_x, sigma_y, theta, offset):
        x, y = xy
        a = np.cos(theta) ** 2 / (2 * sigma_x ** 2) + np.sin(theta) ** 2 / (2 * sigma_y ** 2)
        b = -np.sin(2 * theta) / (4 * sigma_x ** 2) + np.sin(2 * theta) / (4 * sigma_y ** 2)
        c = np.sin(theta) ** 2 / (2 * sigma_x ** 2) + np.cos(theta) ** 2 / (2 * sigma_y ** 2)
        return (offset + amp * np.exp(-(a * (x - x0) ** 2 + 2 * b * (x - x0) * (y - y0)
                                        + c * (y - y0) ** 2))).ravel()

    yy, xx = np.mgrid[:img.shape[0], :img.shape[1]]
    popt, _ = curve_fit(gauss2d, (xx, yy), img.ravel(),
                        p0=[img.max(), 30, 30, 2.0, 2.0, 0.0, 0.0])
    np.testing.assert_allclose([x0, y0, sx, sy],
                               [popt[1], popt[2], abs(popt[3]), abs(popt[4])],
                               atol=5e-3)


def test_mtf_of_gaussian_psf_analytic():
    """MTF of a Gaussian PSF is Gaussian with sigma_f = 1/(2 pi sigma)."""
    hw = 20
    yy, xx = np.mgrid[-hw:hw + 1, -hw:hw + 1].astype(np.float64)
    sigma = 2.0
    psf = np.exp(-(xx ** 2 + yy ** 2) / (2 * sigma ** 2))
    freq, mtf, _, label, nyq = tk.compute_mtf(psf)
    want = np.exp(-2 * (np.pi * sigma * freq) ** 2)
    # integer-radius binning (reference semantics) biases each bin by up to
    # ~0.4/pad in frequency; tolerance sized accordingly
    np.testing.assert_allclose(mtf[:60], want[:60], atol=1.5e-2)
    assert label == "cycles/pixel" and nyq == 0.5
    # crossing finder agrees with analytic inverse
    f50 = tk.mtf_at_fraction(freq, mtf, 0.5)
    want50 = np.sqrt(np.log(2.0) / 2.0) / (np.pi * sigma)
    assert abs(f50 - want50) < 4e-3


def test_mtf_batched_equals_single():
    psfs = np.stack([synth_gaussian(noise=0) for _ in range(3)])
    freq, prof_b, _, _, _ = tk.compute_mtf(psfs)
    for i in range(3):
        _, prof_s, _, _, _ = tk.compute_mtf(psfs[i])
        np.testing.assert_allclose(prof_b[i], prof_s, atol=1e-12)


@pytest.mark.slow
def test_golden_psf_characterization_pos4(reference_root):
    """End-to-end parity on the real calibration data: the headline
    BASELINE.md numbers (pos4 MTF50/MTF10, naive MTF50, per-image sigma)
    must match the reference's checked-in npz."""
    import os
    from enph459_super_resolution_tpu.psf.analyze import (
        analyse_position, discover_images,
    )

    folder = os.path.join(reference_root, "calibration_beam_shift/data")
    records = [r for r in discover_images(folder) if r["position"] == 4]
    assert len(records) == 30
    res = analyse_position([r["path"] for r in records], 50, 3.45)

    ref = np.load(os.path.join(
        reference_root,
        "calibration_psf/results/psf_mtf_by_position_data.npz"))
    assert abs(res["mtf50"] - float(ref["pos4_mtf50"])) < 0.05
    assert abs(res["mtf10"] - float(ref["pos4_mtf10"])) < 0.05
    assert abs(res["mtf50_naive"] - float(ref["pos4_mtf50_naive"])) < 0.05
    # sigma: compare the label-free multiset {sx, sy} means (the reference's
    # labeling is degenerate, see fit canonicalization note)
    mine = np.sort(np.concatenate([res["per_image_sigma_x"],
                                   res["per_image_sigma_y"]]))
    want = np.sort(np.concatenate([ref["pos4_per_image_sigma_x"],
                                   ref["pos4_per_image_sigma_y"]]))
    # batched LM vs scipy trf: measured max deviation 0.0025 px on 3/60 fits
    np.testing.assert_allclose(mine, want, atol=5e-3)
    assert abs(mine.mean() - want.mean()) < 1e-3


def test_load_measured_psf_real_calibration(reference_root):
    """Measured-PSF construction from the real beam-shift sweeps: averaged,
    background-subtracted, normalized, near-Gaussian (rank-limited)."""
    import os
    from enph459_super_resolution_tpu.psf import load_measured_psf
    from enph459_super_resolution_tpu.ops.opmatrix import psf_separable_factors

    k = load_measured_psf(os.path.join(reference_root,
                                       "calibration_beam_shift/data"),
                          verbose=False)
    assert k.shape == (7, 7)
    assert abs(k.sum() - 1.0) < 1e-12
    assert k.min() >= 0.0
    # peak in the centre, energy concentrated
    assert np.unravel_index(k.argmax(), k.shape) == (3, 3)
    rows, _ = psf_separable_factors(k, rel_tol=1e-4)
    assert rows.shape[0] <= 5  # near-separable (Gaussian-like pinhole)
