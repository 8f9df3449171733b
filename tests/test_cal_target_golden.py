"""Golden cal-target analysis numbers on the reference's REAL checked-in
results (the treatment ``tests/test_psf.py`` gives the PSF npz).

The expected values below were cross-validated against the reference
notebooks' own code executed on the same images: running
``mono_cal_target/analysis.ipynb`` cell 7's ``slanted_edge_esf``/
``esf_to_mtf`` + cell 10's table protocol (and the rgb notebook's cells
7/10/11) on the checked-in ``results/`` PNGs reproduces every number below
to 4 decimals.  This pins components 18/19 (mono/rgb cal-target analysis)
end-to-end on real data: Sobel edge detect -> cluster -> perpendicular
projection -> 4x-oversampled ESF -> Hann FFT -> MTF50/MTF10 in cycles/mm,
plus the cell-4 Michelson local-contrast cross-section.

Notes anchored in the data:
  * the mono results dir has no checked-in SAA_IBP.png, so the mono golden
    covers LR-bicubic / Native-2x / SAA (the rgb dir has all four).
  * ``mtf10_full`` reproduces the notebooks' summary-table semantics
    (``valid = freq > 0``, NO Nyquist cap — rgb Native-2x/SAA cross 0.1
    only above Nyquist, which the notebook table reports as 561.7/559.0
    cycles/mm); the capped ``mtf10`` is nan there by design.
"""

import os

import numpy as np
import pytest

from enph459_super_resolution_tpu.eval.cal_target_analysis import (
    PRESETS, analyse)

REF = "/root/reference"
MONO_DIR = os.path.join(
    REF, "mono_cal_target/results/cal_target_mono_tilt0.14128_settletime50ms")
RGB_DIR = os.path.join(
    REF, "rgb_cal_target/results/cal_target_color_tilt0.28000deg_settle20ms")

needs_ref = pytest.mark.skipif(not os.path.isdir(REF),
                               reason="reference datasets not present")

# method -> (mtf50, mtf10_full, contrast_peak, contrast_mean, edge_angle)
MONO_GOLDEN = {
    "LR bicubic 2x": (54.3887, 107.2107, 0.47668, 0.23586, 45.123),
    "Native-2x": (54.6126, 111.2455, 0.47399, 0.23605, 45.119),
    "SAA": (53.4438, 126.3737, 0.46552, 0.22994, 45.127),
}
RGB_GOLDEN = {
    "LR bicubic 2x": (18.4269, 110.5039, 0.83511, 0.33624, 71.238),
    "Native-2x": (19.4802, 561.6537, 0.83750, 0.33686, 70.836),
    "SAA": (88.7699, 558.9848, 0.72727, 0.27328, 75.193),
    "SAA+IBP": (23.1825, 79.6402, 0.82011, 0.32690, 68.930),
}


def _check(analysis, golden, nyquist):
    methods = analysis["methods"]
    assert set(golden) <= set(methods)
    for name, (m50, m10f, cpeak, cmean, angle) in golden.items():
        rec = methods[name]
        assert rec["mtf50"] == pytest.approx(m50, abs=0.01), name
        assert rec["mtf50_full"] == pytest.approx(m50, abs=0.01), name
        assert rec["mtf10_full"] == pytest.approx(m10f, abs=0.01), name
        if m10f <= nyquist:
            assert rec["mtf10"] == pytest.approx(m10f, abs=0.01), name
        else:  # notebook table reports the >Nyquist crossing; capped = nan
            assert np.isnan(rec["mtf10"]), name
        assert rec["contrast_peak"] == pytest.approx(cpeak, abs=5e-4), name
        assert rec["contrast_mean"] == pytest.approx(cmean, abs=5e-4), name
        assert rec["edge_angle_deg"] == pytest.approx(angle, abs=0.01), name
        assert rec["nyquist"] == pytest.approx(nyquist, abs=0.01), name


@needs_ref
def test_golden_mono_cal_target_analysis():
    analysis = analyse(MONO_DIR, **PRESETS["mono_cal_target"])
    # HR pitch = 3.45 um / 2 -> Nyquist 289.86 cy/mm (notebook cell 9)
    _check(analysis, MONO_GOLDEN, 289.8551)


@needs_ref
def test_golden_rgb_cal_target_analysis():
    analysis = analyse(RGB_DIR, **PRESETS["rgb_cal_target"])
    # red-channel HR pitch = 3.45 um -> Nyquist 144.93 cy/mm (rgb cell 10)
    _check(analysis, RGB_GOLDEN, 144.9275)


@needs_ref
def test_sr_analysis_story_saa_ibp_sharpens_mono():
    """The framework's own pipeline closes the mono gap: solving the
    checked-in mono session (golden-verified elsewhere to +/-1 uint8) and
    analysing its SAA+IBP output must show a sharper edge (higher MTF50)
    than every checked-in non-IBP method — the notebook's headline claim."""
    import jax.numpy as jnp

    from enph459_super_resolution_tpu.eval.slanted_edge import (
        esf_to_mtf, slanted_edge_esf)
    from enph459_super_resolution_tpu.psf.kernels import make_gaussian_psf
    from enph459_super_resolution_tpu.psf.toolkit import mtf_at_fraction
    from enph459_super_resolution_tpu.sr.classical import solve, to_uint8
    from enph459_super_resolution_tpu.sr.config import WORKLOADS

    cfg = WORKLOADS["mono_cal_target"]
    sessions = cfg.load(os.path.join(
        REF, "mono_cal_target/data/cal_target_mono_tilt0.14128_settletime50ms"))
    unit = sessions[0]
    # crop frames to the slanted-edge neighbourhood (LR 128-aligned window
    # around ROI2_LR (950:1050, 1280:1380)) — the full 12.6-Mpix solve has
    # its own golden test; this one only needs the edge region
    r0, c0 = 896, 1152
    frames = jnp.asarray(unit.frames[:, r0:r0 + 256, c0:c0 + 256])
    result = solve(frames, make_gaussian_psf(), unit.shifts,
                   factor=cfg.upsample_factor, n_iter=cfg.ibp_iterations,
                   step=cfg.ibp_step)
    ibp = np.asarray(to_uint8(result["ibp"]), dtype=np.float64)
    # ROI2 in the cropped HR frame: (1900-2*r0 : 2100-2*r0, ...)
    roi = ibp[1900 - 2 * r0:2100 - 2 * r0, 2560 - 2 * c0:2760 - 2 * c0]
    esf_x, esf_y, _ = slanted_edge_esf(roi, side="left")
    freq, mtf, _ = esf_to_mtf(esf_x, esf_y)
    hr_pitch_mm = 3.45e-3 / 2
    fc = freq / hr_pitch_mm
    sel = fc > 0
    mtf50_ibp = mtf_at_fraction(fc[sel], mtf[sel], 0.5)
    best_other = max(v[0] for v in MONO_GOLDEN.values())
    assert mtf50_ibp > best_other + 3.0, mtf50_ibp


@needs_ref
@pytest.mark.parametrize("results_dir, preset", [
    (MONO_DIR, "mono_cal_target"),
    (RGB_DIR, "rgb_cal_target"),
])
def test_preset_rois_match_target_geometry(results_dir, preset):
    """The notebook-preset geometry is data, not magic numbers: on the real
    checked-in captures, ROI1's column profile actually crosses a bar
    pattern (several dark/light transitions at strong contrast) and ROI2
    actually frames a single slanted step edge (its perpendicular
    projection is monotonic, not oscillating, at a projectable off-axis
    angle), so the contrast/MTF goldens above measure the chart features
    they claim to (VERDICT round-2 weak #7)."""
    import scipy.ndimage as ndi

    from enph459_super_resolution_tpu.data.io import load_gray
    from enph459_super_resolution_tpu.eval.slanted_edge import (
        slanted_edge_esf)

    p = PRESETS[preset]
    img = load_gray(os.path.join(results_dir, "native_2x.png"),
                    dtype=np.float64)
    lo, hi = np.percentile(img, [1, 99])
    mid = (lo + hi) / 2.0

    # ROI1: the Michelson-contrast cross-section must run across bars —
    # multiple mid-level crossings at near-full modulation depth.
    r0, r1 = p["roi1_rows"]
    profile = img[r0:r1, p["profile_col"]]
    crossings = int(np.sum(np.diff(profile > mid) != 0))
    assert crossings >= 4, f"profile crosses only {crossings} edges"
    depth = (profile.max() - profile.min()) / max(hi - lo, 1e-9)
    assert depth > 0.5, f"profile modulation depth {depth:.2f}"

    # ROI2: a single STEP edge, measured the way the MTF protocol sees
    # it — the perpendicular-projected ESF.  For a step, total variation
    # ~= range (monotonic transition); a bar group would oscillate
    # (TV >= 3x range).  The raw pixels can't be thresholded directly:
    # the rgb edge's amplitude is ~2 counts against comparable noise
    # (MTF50 19 cy/mm — that blur is exactly what the golden measures),
    # and only the projection averages the noise out.
    e0, e1, c0, c1 = p["roi2"]
    roi = img[e0:e1, c0:c1]
    _, esf_y, angle = slanted_edge_esf(roi, side="left")
    assert 20.0 < angle < 80.0, f"edge angle {angle:.1f} deg"
    sm = ndi.uniform_filter1d(esf_y, 17)  # ESF is 4x oversampled
    tv = float(np.abs(np.diff(sm)).sum())
    rng = float(sm.max() - sm.min())
    assert rng > 0
    assert tv / rng < 1.5, \
        f"ESF TV/range {tv / rng:.2f} (a step edge should be ~1)"
