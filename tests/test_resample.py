"""Parity tests: ops.resample / ops.conv vs scipy reference behavior.

SURVEY.md §7 step 1 acceptance: <=1e-3 (f32) max-abs error vs SciPy on random
images including boundaries.  SciPy computes in float64; we compare a float32
TPU-style implementation against SciPy float64 ground truth on images scaled
like the real data (0..255).
"""

import numpy as np
import pytest
import scipy.ndimage as ndi
import scipy.signal

import jax.numpy as jnp

from enph459_super_resolution_tpu.ops import (
    bspline_prefilter_kernel,
    conv2d_same,
    gaussian_filter,
    laplacian,
    sobel,
    spline_coefficients,
    spline_map_coordinates_separable,
    spline_shift,
    spline_zoom,
)

RNG = np.random.default_rng(0)


def make_image(h=41, w=53):
    img = RNG.uniform(0, 255, size=(h, w))
    return img


# ---------------------------------------------------------------------------
# prefilter
# ---------------------------------------------------------------------------


def test_prefilter_kernel_dc_gain():
    h = bspline_prefilter_kernel("float64")
    assert abs(h.sum() - 1.0) < 1e-15


@pytest.mark.parametrize("mode", ["nearest", "mirror", "reflect", "wrap"])
def test_spline_coefficients_match_scipy(mode):
    img = make_image()
    scipy_mode = {"wrap": "grid-wrap"}.get(mode, mode)
    want = ndi.spline_filter(img, order=3, mode=scipy_mode)
    got = np.asarray(spline_coefficients(jnp.asarray(img, jnp.float64), mode=mode))
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_spline_coefficients_f32_tolerance():
    img = make_image()
    want = ndi.spline_filter(img, order=3, mode="nearest")
    got = np.asarray(spline_coefficients(jnp.asarray(img, jnp.float32), mode="nearest"))
    assert np.max(np.abs(got - want)) < 1e-3 * 255


# ---------------------------------------------------------------------------
# shift
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shift", [(0.5, -0.5), (-1.0, 1.0), (0.37, -2.41),
                                   (0.0, 0.0), (-0.5, 0.25)])
def test_spline_shift_matches_scipy(shift):
    img = make_image(64, 72)
    want = ndi.shift(img, shift, order=3, mode="nearest")
    got = np.asarray(spline_shift(jnp.asarray(img, jnp.float32), shift))
    # Full-array (including borders) parity at f32 tolerance: we replicate
    # SciPy's NPAD=12 edge pre-pad exactly.
    np.testing.assert_allclose(got, want, atol=1e-3 * 255, rtol=0)


def test_spline_shift_f64_bit_parity():
    img = make_image(40, 48)
    want = ndi.shift(img, (0.73, -1.29), order=3, mode="nearest")
    got = np.asarray(spline_shift(jnp.asarray(img, jnp.float64), (0.73, -1.29)))
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_spline_shift_batched():
    imgs = np.stack([make_image(32, 40) for _ in range(3)])
    want = np.stack([ndi.shift(im, (0.5, -0.5), order=3, mode="nearest")
                     for im in imgs])
    got = np.asarray(spline_shift(jnp.asarray(imgs, jnp.float32), (0.5, -0.5)))
    b = 4
    np.testing.assert_allclose(got[:, b:-b, b:-b], want[:, b:-b, b:-b],
                               atol=1e-3 * 255)


def test_spline_shift_strided_equals_decimated():
    """forward model fusion: shift with strides == shift then [::f, ::f]."""
    img = make_image(48, 56)
    x = jnp.asarray(img, jnp.float32)
    full = spline_shift(x, (0.7, -0.3))
    dec = spline_shift(x, (0.7, -0.3), strides=(2, 2))
    np.testing.assert_allclose(np.asarray(full)[::2, ::2], np.asarray(dec),
                               atol=1e-5)


# ---------------------------------------------------------------------------
# map_coordinates / zoom
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["nearest", "mirror"])
def test_map_coordinates_separable_matches_scipy(mode):
    img = make_image(40, 44)
    cy = np.linspace(0, img.shape[0] - 1, 83)
    cx = np.linspace(0, img.shape[1] - 1, 91)
    gy, gx = np.meshgrid(cy, cx, indexing="ij")
    want = ndi.map_coordinates(ndi.spline_filter(img, order=3, mode=mode),
                               [gy, gx], order=3, mode=mode, prefilter=False)
    got = np.asarray(spline_map_coordinates_separable(
        jnp.asarray(img, jnp.float64), cy, cx, mode=mode))
    np.testing.assert_allclose(got, want, atol=1e-9)


@pytest.mark.parametrize("factor", [2.0, 2])
def test_spline_zoom_matches_scipy(factor):
    img = make_image(33, 47)
    want = ndi.zoom(img, factor, order=3)  # scipy default mode='constant'
    got = np.asarray(spline_zoom(jnp.asarray(img, jnp.float64), factor))
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_spline_zoom_f32_tolerance():
    img = make_image(64, 80)
    want = ndi.zoom(img, 2, order=3)
    got = np.asarray(spline_zoom(jnp.asarray(img, jnp.float32), 2))
    assert np.max(np.abs(got - want)) < 1e-3 * 255


# ---------------------------------------------------------------------------
# conv
# ---------------------------------------------------------------------------


def test_conv2d_same_matches_fftconvolve():
    img = make_image(50, 60)
    k = RNG.uniform(size=(7, 7))
    k /= k.sum()
    want = scipy.signal.fftconvolve(img, k, mode="same")
    got = np.asarray(conv2d_same(jnp.asarray(img, jnp.float64), k))
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_conv2d_same_asymmetric_kernel():
    img = make_image(30, 31)
    k = RNG.uniform(size=(5, 7))
    want = scipy.signal.fftconvolve(img, k, mode="same")
    got = np.asarray(conv2d_same(jnp.asarray(img, jnp.float64), k))
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_gaussian_filter_matches_scipy():
    img = make_image(40, 42)
    want = ndi.gaussian_filter(img, sigma=2.0)
    got = np.asarray(gaussian_filter(jnp.asarray(img, jnp.float64), 2.0))
    np.testing.assert_allclose(got, want, atol=1e-10)


@pytest.mark.parametrize("axis", [0, 1])
def test_sobel_matches_scipy(axis):
    img = make_image(24, 28)
    want = ndi.sobel(img, axis=axis)
    got = np.asarray(sobel(jnp.asarray(img, jnp.float64), axis=axis - 2))
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_laplacian_matches_cv2_kernel():
    img = make_image(20, 22)
    k = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], dtype=np.float64)
    want = scipy.signal.correlate2d(img, k, mode="same", boundary="fill")
    got = np.asarray(laplacian(jnp.asarray(img, jnp.float64)))
    np.testing.assert_allclose(got, want, atol=1e-10)
