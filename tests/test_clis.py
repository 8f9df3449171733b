"""CLI surface smoke tests: every console entry point runs end-to-end on
synthetic or reference data and produces its artifacts."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(mod, *args):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-m", mod, *args],
                       capture_output=True, text=True, cwd=REPO, env=env,
                       timeout=600)
    assert r.returncode == 0, (mod, r.stdout[-800:], r.stderr[-800:])
    return r.stdout


def test_plots_beam_shifts_cli(tmp_path, reference_root):
    out = str(tmp_path / "shifts.png")
    run_cli("enph459_super_resolution_tpu.utils.plots", "beam-shifts",
            os.path.join(reference_root, "calibration_beam_shift/data/"
                         "shifts.csv"), out)
    assert os.path.getsize(out) > 10000


def test_plots_dof_cli(tmp_path):
    data = {"positions": [350 + i for i in range(20)],
            "values": [1.0 / (1 + abs(i - 10)) for i in range(20)],
            "best_pos_mm": 360.0, "metric": "Laplacian Variance"}
    jpath = str(tmp_path / "af.json")
    json.dump(data, open(jpath, "w"))
    out = str(tmp_path / "dof.png")
    stdout = run_cli("enph459_super_resolution_tpu.utils.plots", "dof",
                     jpath, out)
    assert "DoF" in stdout and os.path.getsize(out) > 5000


def test_psf_cli(tmp_path):
    from enph459_super_resolution_tpu.data.io import save_png

    rng = np.random.default_rng(0)
    for i in range(3):
        yy, xx = np.mgrid[:96, :128].astype(np.float64)
        img = 4.0 + 220 * np.exp(-((yy - 48.3 - 0.1 * i) ** 2 +
                                   (xx - 64.7) ** 2) / (2 * 1.3 ** 2))
        img += rng.normal(0, 1.0, img.shape)
        save_png(np.clip(img, 0, 255).astype(np.uint8),
                 str(tmp_path / f"psf_{i}.png"))
    out = str(tmp_path / "out")
    stdout = run_cli("enph459_super_resolution_tpu.psf.cli",
                     str(tmp_path / "psf_*.png"), "--crop-radius", "24",
                     "--output-dir", out)
    assert "sigma_x=" in stdout
    assert os.path.exists(os.path.join(out, "psf_mtf_data.npz"))
    assert os.path.exists(os.path.join(out, "psf_mtf_summary.png"))


def test_cal_target_analysis_cli(tmp_path):
    """Generate a tiny results dir with a slanted edge + bars, analyse it."""
    import scipy.ndimage as ndi
    from enph459_super_resolution_tpu.data.io import save_png

    h, w = 320, 360
    yy, xx = np.mgrid[:h, :w].astype(np.float64)
    img = np.where(xx > w / 2 + 0.08 * (yy - h / 2), 210.0, 40.0)
    img[40:120, 20:140] = np.where((yy[40:120, 20:140] // 6) % 2, 220, 30)
    img = ndi.gaussian_filter(img, 1.0)
    rdir = tmp_path / "res"
    os.makedirs(rdir)
    for name in ["native_2x.png", "SAA.png", "SAA_IBP.png", "LR_mean.png"]:
        scale = 0.5 if name == "LR_mean.png" else 1.0
        im = ndi.zoom(img, scale, order=1) if scale != 1.0 else img
        save_png(np.clip(im, 0, 255).astype(np.uint8), str(rdir / name))

    out = str(tmp_path / "analysis")
    stdout = run_cli(
        "enph459_super_resolution_tpu.eval.cal_target_analysis", str(rdir),
        "--profile-col", "60", "--roi1-rows", "40", "120",
        "--roi2", "100", "260", "120", "300", "--out-dir", out)
    assert "MTF50" in stdout
    data = json.load(open(os.path.join(out, "analysis.json")))
    rec = data["methods"]["SAA+IBP"]
    assert np.isfinite(rec["mtf50"]) and rec["mtf50"] > 0
    assert rec["contrast_peak"] > 0.5


def test_barcode_analysis_cli_ean13(tmp_path):
    from enph459_super_resolution_tpu.data.io import save_png
    from enph459_super_resolution_tpu.eval import ean13

    digits = "4006381333931"
    img = ean13.render(digits, module_px=3, height_px=80)
    canvas = np.full((200, img.shape[1] + 80), 235.0)
    canvas[60:140, 40:40 + img.shape[1]] = img
    rdir = tmp_path / "results" / "sess" / "rep0"
    os.makedirs(rdir)
    for name in ["native_2x.png", "SAA.png", "SAA_IBP.png"]:
        save_png(np.clip(canvas, 0, 255).astype(np.uint8), str(rdir / name))

    rois = {"sess": [{"label": "demo", "roi": [40, 160, 20, int(canvas.shape[1]) - 20],
                      "pitch_mil": 5}]}
    rpath = str(tmp_path / "rois.json")
    json.dump(rois, open(rpath, "w"))
    out = str(tmp_path / "conf.json")
    fig = str(tmp_path / "conf_vs_pitch.png")
    stdout = run_cli("enph459_super_resolution_tpu.eval.barcode_analysis",
                     str(tmp_path / "results"), "--rois", rpath,
                     "--decoder", "ean13", "--out", out, "--figure", fig)
    assert digits in stdout
    data = json.load(open(out))
    recs = data["sessions"][0]["records"]
    assert all(r["decoded_text"] == digits for r in recs)
    assert all(r["confidence"] > 0.8 for r in recs)
    # confidence-vs-pitch figure (reference analysis.ipynb cell 14)
    assert os.path.exists(fig) and os.path.getsize(fig) > 1000
