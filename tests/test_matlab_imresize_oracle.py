"""Independent MATLAB-imresize oracle (VERDICT round-3 item 4).

BASELINE.json's north star is PSNR/SSIM parity ±0.05 dB on Set5/Set14,
whose "bicubic" is MATLAB ``imresize`` semantics.  Until round 3 the only
cross-check of ``ops.resize.resize_matrix`` was PIL's BICUBIC (interior
only — PIL differs at borders).  This file reimplements the published
MATLAB imresize algorithm *from scratch* in loop-level numpy — 1-based
coordinate mapping, Keys a=-0.5 kernel, kernel widening + rescaling under
antialiased downsampling, per-pixel weight normalization, and the
``aux = [1:n, n:-1:1]`` symmetric boundary — and pins ``resize_matrix``
against it entry-for-entry INCLUDING edges, plus the Y-channel/shave eval
protocol against hand-computed values.  With these pinned, dropping real
Set5/Set14 files into ``train.evaluate --data-dir`` produces
literature-comparable numbers with no code risk.
"""

import numpy as np
import pytest

from enph459_super_resolution_tpu.ops.resize import (
    bicubic_degrade,
    bicubic_upsample,
    resize,
    resize_matrix,
)


# --- the oracle: MATLAB imresize, written independently -----------------


def _matlab_cubic(x):
    """MATLAB's cubic(x): Keys (1981) kernel with a = -0.5."""
    x = abs(float(x))
    if x <= 1.0:
        return 1.5 * x**3 - 2.5 * x**2 + 1.0
    if x < 2.0:
        return -0.5 * x**3 + 2.5 * x**2 - 4.0 * x + 2.0
    return 0.0


def matlab_contributions(in_len: int, out_len: int, antialias: bool = True):
    """MATLAB images.internal.resize ``contributions`` for the cubic
    kernel, as a dense (out_len, in_len) float64 matrix.  Deliberately
    scalar/loop-level (1-based like MATLAB) so it shares nothing with the
    vectorized production code it checks."""
    scale = out_len / in_len
    if scale < 1.0 and antialias:
        def h(x):
            return scale * _matlab_cubic(scale * x)
        kernel_width = 4.0 / scale
    else:
        h = _matlab_cubic
        kernel_width = 4.0

    p = int(np.ceil(kernel_width)) + 2
    m = np.zeros((out_len, in_len), dtype=np.float64)
    # symmetric boundary: aux = [1:n, n:-1:1] (1-based)
    aux = list(range(1, in_len + 1)) + list(range(in_len, 0, -1))
    for x in range(1, out_len + 1):              # 1-based output index
        u = x / scale + 0.5 * (1.0 - 1.0 / scale)
        left = int(np.floor(u - kernel_width / 2.0))
        raw_idx = [left + j for j in range(p)]
        w = [h(u - i) for i in raw_idx]
        s = sum(w)
        w = [v / s for v in w]
        for v, i in zip(w, raw_idx):
            src = aux[(i - 1) % (2 * in_len)]    # MATLAB index mapping
            m[x - 1, src - 1] += v
    return m


# --- resize_matrix pinned to the oracle, edges included -----------------


@pytest.mark.parametrize("n_in,n_out,antialias", [
    (16, 8, True),     # x1/2 down, antialiased (the degradation protocol)
    (16, 8, False),    # x1/2 down, no antialias
    (12, 3, True),     # x1/4 down
    (8, 16, True),     # x2 up (antialias flag is a no-op upsampling)
    (8, 32, True),     # x4 up
    (7, 5, True),      # non-integer ratio down
    (5, 9, True),      # non-integer ratio up
    (4, 4, True),      # identity
    (3, 7, True),      # tiny input: boundary folding exercises aux wrap
])
def test_resize_matrix_matches_matlab_oracle(n_in, n_out, antialias):
    ours = np.asarray(
        resize_matrix(n_in, n_out, antialias, "float64"), np.float64)
    oracle = matlab_contributions(n_in, n_out, antialias)
    np.testing.assert_allclose(ours, oracle, rtol=0, atol=1e-12)


def test_resize_image_matches_oracle_including_edges():
    """Full 2-D separable resize on a random image: every pixel (edges
    included) must match the oracle applied row/column-wise."""
    rng = np.random.default_rng(7)
    img = rng.uniform(0, 255, (14, 22)).astype(np.float64)
    for out_shape in [(7, 11), (28, 44), (10, 15)]:
        mr = matlab_contributions(14, out_shape[0])
        mc = matlab_contributions(22, out_shape[1])
        want = mr @ img @ mc.T
        got = np.asarray(resize(img, out_shape))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)


def test_degrade_upsample_roundtrip_protocol():
    """bicubic_degrade is the antialiased downsample, bicubic_upsample the
    plain cubic upsample — the exact LR/SR-baseline pair of the papers."""
    rng = np.random.default_rng(8)
    hr = rng.uniform(0, 255, (16, 16)).astype(np.float64)
    lr = np.asarray(bicubic_degrade(hr, 2))
    np.testing.assert_allclose(lr, matlab_contributions(16, 8) @ hr
                               @ matlab_contributions(16, 8).T, atol=1e-9)
    up = np.asarray(bicubic_upsample(lr.astype(np.float64), 2))
    m_up = matlab_contributions(8, 16)
    np.testing.assert_allclose(up, m_up @ lr @ m_up.T, atol=1e-9)


# --- Y-channel + shave protocol against hand-computed values ------------


def test_y_channel_bt601_hand_values():
    from enph459_super_resolution_tpu.eval.metrics import y_channel

    # BT.601 full->studio-swing luma: Y = (65.481 R + 128.553 G +
    # 24.966 B)/255 + 16 — the SR-paper convention (evaluate on Y only)
    px = np.array([[[255.0, 255.0, 255.0],   # white -> 235.0
                    [0.0, 0.0, 0.0],         # black -> 16.0
                    [255.0, 0.0, 0.0],       # red   -> 81.481
                    [0.0, 255.0, 0.0],       # green -> 144.553
                    [0.0, 0.0, 255.0]]])     # blue  -> 40.966
    y = np.asarray(y_channel(px))[0]
    np.testing.assert_allclose(
        y, [235.0, 16.0, 81.481, 144.553, 40.966], atol=1e-3)


def test_psnr_on_y_with_shave_hand_computed():
    """evaluate_sr's metric chain (Y channel -> shave=scale -> PSNR) on a
    case small enough to hand-compute."""
    from enph459_super_resolution_tpu.eval.metrics import psnr, y_channel

    scale = 2
    rng = np.random.default_rng(9)
    hr = rng.uniform(0, 255, (8, 8, 3)).astype(np.float32)
    pred = hr.copy()
    pred[4, 4] += np.array([10.0, -5.0, 2.0], np.float32)  # interior error
    pred[0, 0] += 100.0  # border error the shave must discard

    y_hr = np.asarray(y_channel(hr))[scale:-scale, scale:-scale]
    y_pr = np.asarray(y_channel(pred))[scale:-scale, scale:-scale]
    dy = (10.0 * 65.481 - 5.0 * 128.553 + 2.0 * 24.966) / 255.0
    mse = dy * dy / y_hr.size
    want = 10.0 * np.log10(255.0 ** 2 / mse)
    got = float(psnr(y_pr, y_hr))
    assert got == pytest.approx(want, abs=1e-3)
