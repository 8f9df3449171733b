"""Evaluation metric tests: SSIM/PSNR sanity + skimage parity when present,
slanted-edge MTF on a synthetic edge with known blur, contrast semantics,
decode-confidence harness with an injected decoder."""

import numpy as np
import pytest
import scipy.ndimage as ndi

from enph459_super_resolution_tpu.eval import (
    decode_confidence, esf_to_mtf, local_contrast, psnr, slanted_edge_esf,
    ssim,
)

RNG = np.random.default_rng(5)


def test_psnr_basics():
    a = RNG.uniform(0, 255, (32, 32))
    assert float(psnr(a, a)) > 100
    b = a + 10.0
    # uniform offset of 10 -> MSE 100 -> PSNR = 10 log10(255^2/100) = 28.13
    assert abs(float(psnr(b, a)) - 28.1308) < 1e-3


def test_ssim_matches_skimage():
    skimage = pytest.importorskip("skimage.metrics")
    a = RNG.uniform(0, 255, (64, 64))
    b = np.clip(a + RNG.normal(0, 12, a.shape), 0, 255)
    want = skimage.structural_similarity(
        a, b, data_range=255.0, gaussian_weights=True, sigma=1.5,
        use_sample_covariance=False)
    got = float(ssim(a, b))
    assert abs(got - want) < 5e-3


def _ssim_reference_numpy(x, y, data_range=255.0, sigma=1.5, k1=0.01,
                          k2=0.03):
    """Independent oracle: Wang et al. 2004 SSIM in the exact skimage
    protocol (gaussian_weights=True, sigma=1.5, use_sample_covariance=
    False => Gaussian window truncated at 3.5 sigma, population
    covariances, valid-region mean after cropping the filter radius).
    Pure scipy/numpy so the oracle cross-check runs hermetically —
    skimage itself is not installed in every environment."""
    import scipy.ndimage as ndi

    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    filt = lambda im: ndi.gaussian_filter(im, sigma, truncate=3.5)
    ux, uy = filt(x), filt(y)
    uxx, uyy, uxy = filt(x * x), filt(y * y), filt(x * y)
    vx = uxx - ux * ux
    vy = uyy - uy * uy
    vxy = uxy - ux * uy
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux * ux + uy * uy + c1) * (vx + vy + c2))
    pad = int(3.5 * sigma + 0.5)  # skimage crops the filter radius
    return float(s[pad:-pad, pad:-pad].mean())


def test_ssim_matches_hermetic_oracle():
    """The SSIM oracle cross-check that runs everywhere (the skimage test
    above skips wherever skimage is absent — which is exactly this target
    environment).  Deterministic seeded inputs at three noise levels."""
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 255, (64, 64))
    for noise in (5.0, 12.0, 40.0):
        b = np.clip(a + rng.normal(0, noise, a.shape), 0, 255)
        want = _ssim_reference_numpy(a, b)
        got = float(ssim(a, b))
        assert abs(got - want) < 5e-3, (noise, got, want)


def test_ssim_identity_and_ordering():
    a = RNG.uniform(0, 255, (48, 48))
    assert float(ssim(a, a)) > 0.999
    noisy1 = np.clip(a + RNG.normal(0, 5, a.shape), 0, 255)
    noisy2 = np.clip(a + RNG.normal(0, 30, a.shape), 0, 255)
    assert float(ssim(noisy1, a)) > float(ssim(noisy2, a))


def test_log_spectral_distance_perception_distortion():
    """The spectral metric must capture what PSNR cannot: an oversmoothed
    (MMSE-style) image scores BETTER on PSNR but WORSE on spectral distance
    than an image with wrong pixels and the right texture statistics."""
    from enph459_super_resolution_tpu.eval.metrics import (
        log_spectral_distance)

    base = ndi.gaussian_filter(RNG.uniform(0, 255, (96, 96)), 4.0)
    tex = RNG.standard_normal((96, 96)) * 12.0
    hr = base + tex
    assert float(log_spectral_distance(hr, hr)) < 1e-5
    smooth = base  # the conditional mean: texture suppressed
    retex = base + RNG.standard_normal((96, 96)) * 12.0  # wrong phase,
    # right statistics (what a GAN recovers)
    d_smooth = float(log_spectral_distance(smooth, hr))
    d_retex = float(log_spectral_distance(retex, hr))
    assert d_smooth > 3 * d_retex > 0
    # ...while PSNR orders them the other way around
    assert float(psnr(smooth, hr)) > float(psnr(retex, hr))


def test_local_contrast_matches_notebook_loop():
    prof = RNG.uniform(0, 255, 200)
    window = 16
    got = local_contrast(prof, window)
    hw = window // 2
    for i in range(hw, len(prof) - hw):
        seg = prof[i - hw: i + hw]
        want = (seg.max() - seg.min()) / (seg.max() + seg.min() + 1e-9)
        assert abs(got[i] - want) < 1e-12


def make_slanted_edge(h=96, w=96, angle_deg=5.0, blur_sigma=1.2,
                      lo=30.0, hi=220.0):
    """Synthetic slanted step edge, Gaussian-blurred: known ground truth."""
    yy, xx = np.mgrid[:h, :w].astype(np.float64)
    m = np.tan(np.radians(angle_deg))
    edge_c = w / 2 + m * (yy - h / 2)
    img = np.where(xx > edge_c, hi, lo)
    return ndi.gaussian_filter(img, blur_sigma)


def test_slanted_edge_mtf_recovers_gaussian_blur():
    sigma = 1.2
    roi = make_slanted_edge(blur_sigma=sigma)
    # the synthetic has ONE edge; the detector's cluster split keeps the
    # requested side of the centre line, which for a single edge keeps ~half
    # the gradient pixels on either side — both give the same edge
    esf_x, esf_y, angle = slanted_edge_esf(roi, side="left")
    assert abs(abs(angle) - 85.0) < 3.0 or abs(abs(angle) - 5.0) < 3.0
    freq, mtf, lsf = esf_to_mtf(esf_x, esf_y)
    want = np.exp(-2 * (np.pi * sigma * freq) ** 2)
    sel = freq <= 0.4
    assert np.max(np.abs(mtf[sel] - want[sel])) < 0.08


def test_decode_confidence_with_injected_decoder():
    img = RNG.uniform(0, 255, (100, 120)).astype(np.uint8)
    roi = (20, 60, 30, 90)

    calls = []

    def fake_decoder(crop):
        calls.append(crop.shape)
        return "HELLO" if crop.shape[0] >= 40 else None

    text, conf = decode_confidence(img, roi, n_trials=25, decoder=fake_decoder)
    assert text == "HELLO"
    assert len(calls) == 26  # centre + 25 jitters
    assert 0.0 <= conf <= 1.0
    # jitter offsets are seeded: repeat run must be identical
    text2, conf2 = decode_confidence(img, roi, n_trials=25,
                                     decoder=fake_decoder)
    assert (text, conf) == (text2, conf2)
