"""Analytic banded-operator construction (round 4).

Round 1-3 built every 1-D operator by materializing the dense
(n_out, n_in) float64 matrix (``_band_matrix`` + BLAS compositions) and
scanning it for nonzeros — 15-50 s of single-core numpy per cold flagship
config and >10 min for the 4-rep-tiled adjoint set (PERF_NOTES round-3
boundary).  Round 4 builds the band entries directly from the
kernel/shift/stride algebra (``HostBanded`` + band_compose /
band_decimate_cols / band_transpose).  These tests pin the new path to the
legacy dense algorithm (reimplemented here verbatim as the oracle) and to
basic linear-algebra identities.
"""

import math
import time

import numpy as np
import pytest

from enph459_super_resolution_tpu.ops import opmatrix as om
from enph459_super_resolution_tpu.ops.resample import (
    _sampling_matrix,
    bspline_prefilter_kernel,
    cubic_bspline_weights,
    zoom_coords,
)

TAPS7 = np.exp(-np.arange(-3, 4) ** 2 / 2.0)
TAPS7 = tuple(TAPS7 / TAPS7.sum())


# --- the pre-round-4 dense construction, kept verbatim as the oracle ----


def dense_shift_op(n_in, delta, mode="nearest", stride=1, n_out=None,
                   blur_taps=None, blur_first=True, dtype_name="float32"):
    h = bspline_prefilter_kernel(dtype_name)
    hw = (len(h) - 1) // 2
    s = -float(delta)
    mfloor = math.floor(s)
    w = cubic_bspline_weights(np.float64(s - mfloor))
    g = np.convolve(h, w)
    offset = (mfloor - 1) - hw
    n_out = n_out if n_out is not None else (n_in - 1) // stride + 1
    if blur_taps is None:
        return om._band_matrix(n_out, n_in, g, offset, mode, stride).astype(
            np.dtype(dtype_name))
    taps = np.asarray(blur_taps, np.float64)
    bhw = (len(taps) - 1) // 2
    if blur_first:
        m = om._band_matrix(n_out, n_in, g, offset, mode, stride) @ \
            om._band_matrix(n_in, n_in, taps, -bhw, None)
    else:
        m = om._band_matrix(n_out, n_out, taps, -bhw, None) @ \
            om._band_matrix(n_out, n_in, g, offset, mode, stride)
    return m.astype(np.dtype(dtype_name))


def dense_stuff_op(n_lr, factor, delta, blur_taps=None,
                   dtype_name="float32"):
    m = dense_shift_op(n_lr * factor, delta, blur_taps=blur_taps,
                       blur_first=False, dtype_name="float64")
    return m[:, ::factor].astype(np.dtype(dtype_name))


def dense_zoom_op(n_in, factor, mode="mirror", dtype_name="float32"):
    n_out, coords = zoom_coords(n_in, factor)
    del n_out
    m_sample = _sampling_matrix(n_in, tuple(coords), mode, "float64")
    h = bspline_prefilter_kernel("float64")
    hw = (len(h) - 1) // 2
    m_pref = om._band_matrix(n_in, n_in, h, -hw, mode)
    return (m_sample @ m_pref).astype(np.dtype(dtype_name))


# --- parity vs the dense oracle ----------------------------------------


@pytest.mark.parametrize(
    "n_in,delta,stride,n_out,blur_taps,blur_first",
    [
        (64, 0.37, 1, None, None, True),
        (128, 1.0, 2, 64, TAPS7[::-1], True),
        (96, -0.5, 2, 48, TAPS7, True),
        (100, 0.25, 1, None, TAPS7, False),
        (257, -1.37, 1, None, None, True),
        (31, 13.6, 1, None, None, True),  # shift past the 12-sample pre-pad
    ],
)
def test_shift_op_bit_identical_to_dense(n_in, delta, stride, n_out,
                                         blur_taps, blur_first):
    a = dense_shift_op(n_in, delta, stride=stride, n_out=n_out,
                       blur_taps=blur_taps, blur_first=blur_first)
    b = om.shift_op_matrix(n_in, delta, stride=stride, n_out=n_out,
                           blur_taps=blur_taps, blur_first=blur_first)
    assert a.shape == b.shape
    assert np.array_equal(a, b)


@pytest.mark.parametrize("n_lr,factor,delta,blur_taps",
                         [(64, 2, -1.0, TAPS7), (50, 2, 0.74, TAPS7),
                          (33, 3, -0.5, None)])
def test_stuff_op_bit_identical_to_dense(n_lr, factor, delta, blur_taps):
    a = dense_stuff_op(n_lr, factor, delta, blur_taps=blur_taps)
    b = om.stuff_shift_op_matrix(n_lr, factor, delta, blur_taps=blur_taps)
    assert np.array_equal(a, b)


@pytest.mark.parametrize("n_in,factor", [(64, 2.0), (49, 2.0), (31, 1.5)])
def test_zoom_op_matches_dense(n_in, factor):
    # the 4-tap sampling x prefilter composition sums in tap order vs
    # BLAS's blocked order: identical everywhere except ~1e-17-magnitude
    # prefilter-tail entries (measured maxdiff 4.2e-17 at every size)
    a = dense_zoom_op(n_in, factor).astype(np.float64)
    b = om.zoom_op_matrix(n_in, factor).astype(np.float64)
    assert np.abs(a - b).max() < 1e-15


def test_mirror_mode_sampling_banded_matches_dense():
    coords = np.linspace(-1.7, 35.2, 57)
    for mode in ("mirror", "nearest", "reflect", "wrap"):
        dense = _sampling_matrix(30, tuple(coords), mode, "float64")
        hb = om._sampling_banded(30, coords, mode)
        assert np.array_equal(hb.to_dense(), dense)


# --- banded linear-algebra identities -----------------------------------


def _random_banded(rng, n_out, n_in, width):
    start = np.sort(rng.integers(0, n_in - width + 1, n_out))
    data = rng.normal(size=(n_out, width))
    return om.HostBanded(data, start.astype(np.int64), n_in)


def test_band_compose_matches_dense_matmul():
    rng = np.random.default_rng(3)
    a = _random_banded(rng, 40, 60, 7)
    b = _random_banded(rng, 60, 55, 9)
    c = om.band_compose(a, b)
    ref = a.to_dense() @ b.to_dense()
    assert c.shape == ref.shape
    np.testing.assert_allclose(c.to_dense(), ref, rtol=0, atol=1e-12)


def test_band_transpose_matches_dense_transpose():
    rng = np.random.default_rng(4)
    for n_out, n_in, w in [(40, 60, 7), (64, 32, 5), (7, 7, 3)]:
        a = _random_banded(rng, n_out, n_in, w)
        t = om.band_transpose(a)
        assert np.array_equal(t.to_dense(), a.to_dense().T)


def test_band_decimate_matches_dense_slice():
    rng = np.random.default_rng(5)
    for step in (2, 3):
        a = _random_banded(rng, 48, 66, 11)
        d = om.band_decimate_cols(a, step)
        assert np.array_equal(d.to_dense(), a.to_dense()[:, ::step])


def test_from_banded_matches_from_matrix():
    hb = om.shift_op_banded(300, 0.5, stride=2, n_out=150,
                            blur_taps=TAPS7[::-1])
    via_banded = om.BandedOp.from_banded(hb, block=64, pack_pallas=False)
    via_dense = om.BandedOp.from_matrix(hb.to_dense(np.float32), block=64,
                                        pack_pallas=False)
    assert via_banded.col_ranges == via_dense.col_ranges
    assert via_banded.n_out == via_dense.n_out
    assert via_banded.n_in == via_dense.n_in
    for x, y in zip(via_banded.blocks, via_dense.blocks):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_adjoint_banded_transpose_equals_dense_transpose():
    """solver='adjoint' transposes the f64 band then casts; the legacy path
    cast then transposed — identical either way."""
    from enph459_super_resolution_tpu.sr.classical import (
        _frame_operator_banded, make_gaussian_psf)

    psf = make_gaussian_psf()
    fr, fc, br, bc = _frame_operator_banded(psf, (0.5, -0.5), 2, (32, 40),
                                            "float32", solver="adjoint")
    for fwd, bwd in zip(fr + fc, br + bc):
        assert np.array_equal(bwd.to_dense(np.float32),
                              fwd.to_dense(np.float32).T)


# --- the whole point: cold host builds are no longer the bottleneck -----


def test_flagship_cold_build_is_fast():
    """Flagship (1536x2048 x5 frames) operator build, cold, including the
    round-3 showstopper: the 4-rep-tiled ADJOINT set.  Legacy cost: 15-50 s
    (ibp) / >10 min (batched adjoint); analytic cost measured 0.6 s / 0.2 s
    on this host.  The bound is 30 s to stay robust under CI contention
    while still failing decisively on any dense-matrix regression."""
    from enph459_super_resolution_tpu.sr import classical as cl

    shifts = ((0.0, 0.0), (0.5, -0.5), (0.5, 0.5), (-0.5, -0.5), (-0.5, 0.5))
    psf = cl.make_gaussian_psf()
    om.shift_op_banded.cache_clear()
    om.stuff_shift_op_banded.cache_clear()
    om.zoom_op_banded.cache_clear()
    t0 = time.time()
    cl._host_solve_matrices(psf, shifts, 2, (1536, 2048), "float32")
    t_ibp = time.time() - t0
    om.shift_op_banded.cache_clear()
    om.stuff_shift_op_banded.cache_clear()
    om.zoom_op_banded.cache_clear()
    t0 = time.time()
    cl._host_solve_matrices(psf, shifts[:4], 2, (1536, 2048), "float32",
                            reps=4, solver="adjoint")
    t_adj = time.time() - t0
    assert t_ibp < 30.0, f"flagship ibp build took {t_ibp:.1f}s"
    assert t_adj < 30.0, f"flagship 4-rep adjoint build took {t_adj:.1f}s"
