"""SR pipeline behaviors: artifacts, idempotent resume, batched reps, and
the real rgb_barcodes session loader."""

import json
import os

import numpy as np
import pytest
import scipy.ndimage as ndi

from enph459_super_resolution_tpu.sr import make_gaussian_psf
from enph459_super_resolution_tpu.sr.config import WORKLOADS
from enph459_super_resolution_tpu.sr.pipeline import process_session_dir


@pytest.fixture()
def tiny_session(tmp_path):
    """A synthetic corner_rep session with 2 reps of 4 corners."""
    from enph459_super_resolution_tpu.data.io import save_png

    rng = np.random.default_rng(0)
    scene = ndi.gaussian_filter(rng.uniform(0, 255, (64, 80)), 1.2)
    sdir = tmp_path / "data" / "tiny_mono_session"
    os.makedirs(sdir)
    for ci in range(4):
        for ri in range(2):
            img = np.clip(scene + rng.normal(0, 1, scene.shape), 0,
                          255).astype(np.uint8)
            save_png(img, str(sdir / f"corner{ci}_rep{ri:02d}.png"))
    return str(sdir)


def test_pipeline_artifacts_and_resume(tiny_session, tmp_path):
    cfg = WORKLOADS["mono_barcodes"]
    out = str(tmp_path / "results")
    psf = make_gaussian_psf()

    n = process_session_dir(tiny_session, psf, cfg, out, figures=False,
                            batch_reps=True)
    assert n == 2  # both reps, batched path
    rep0 = os.path.join(out, "tiny_mono_session", "rep0")
    for f in ["native_2x.png", "SAA.png", "SAA_IBP.png", "LR_mean.png",
              "shifts.json", "metrics.json", "done.flag"]:
        assert os.path.exists(os.path.join(rep0, f)), f

    metrics = json.load(open(os.path.join(rep0, "metrics.json")))
    assert metrics["hr_shape"] == [128, 160]
    assert metrics["ibp_iterations"] == cfg.ibp_iterations
    assert len(metrics["mse_history"]) == cfg.ibp_iterations
    assert metrics["mse_history"][-1] < metrics["mse_history"][0]

    # idempotent resume: done.flag skips everything
    n2 = process_session_dir(tiny_session, psf, cfg, out, figures=False)
    assert n2 == 0

    # force reprocesses
    n3 = process_session_dir(tiny_session, psf, cfg, out, figures=False,
                             force=True)
    assert n3 == 2


def test_pipeline_figures(tiny_session, tmp_path):
    cfg = WORKLOADS["mono_barcodes"]
    out = str(tmp_path / "resfig")
    process_session_dir(tiny_session, make_gaussian_psf(), cfg, out,
                        figures=True)
    rep0 = os.path.join(out, "tiny_mono_session", "rep0")
    assert os.path.exists(os.path.join(rep0, "comparison.png"))
    assert os.path.exists(os.path.join(rep0, "convergence.png"))


def test_cross_session_unit_batching(tiny_session, tmp_path):
    """process_workload batches units ACROSS sessions (the dp axis spans
    the whole workload, reference loop `mono_barcodes/run_sr.py:393-395`);
    outputs are bit-identical to per-session processing."""
    import shutil

    from PIL import Image

    from enph459_super_resolution_tpu.sr.pipeline import process_workload

    data_dir = os.path.dirname(tiny_session)
    second = os.path.join(data_dir, "tiny_mono_b")
    shutil.copytree(tiny_session, second)
    cfg = WORKLOADS["mono_barcodes"]
    psf = make_gaussian_psf()

    out_b = str(tmp_path / "batched")
    n = process_workload([tiny_session, second], psf, cfg, out_b,
                         figures=False, max_batch=3)  # 4 units -> 3+1 split
    assert n == 4

    out_s = str(tmp_path / "sequential")
    for sdir in [tiny_session, second]:
        process_session_dir(sdir, psf, cfg, out_s, figures=False,
                            batch_reps=False)

    for sess in ["tiny_mono_session", "tiny_mono_b"]:
        for rep in ["rep0", "rep1"]:
            for f in ["SAA_IBP.png", "SAA.png", "native_2x.png"]:
                a = np.asarray(Image.open(os.path.join(out_b, sess, rep, f)))
                b = np.asarray(Image.open(os.path.join(out_s, sess, rep, f)))
                np.testing.assert_array_equal(a, b, err_msg=(sess, rep, f))

    # idempotent: a second pass skips everything
    assert process_workload([tiny_session, second], psf, cfg, out_b,
                            figures=False) == 0


def test_cross_session_batching_flushes_on_shape_change(tiny_session,
                                                        tmp_path):
    """Units with a different (shape, shifts) key cannot join the same
    rep-tiled batch: the stream must flush between them and still process
    everything."""
    from enph459_super_resolution_tpu.data.io import save_png
    from enph459_super_resolution_tpu.sr.pipeline import process_workload

    data_dir = os.path.dirname(tiny_session)
    other = os.path.join(data_dir, "tiny_mono_wide")
    os.makedirs(other)
    rng = np.random.default_rng(3)
    for ci in range(4):
        save_png(rng.uniform(0, 255, (48, 96)).astype(np.uint8),
                 os.path.join(other, f"corner{ci}_rep00.png"))

    out = str(tmp_path / "mixed")
    n = process_workload([tiny_session, other], make_gaussian_psf(),
                         WORKLOADS["mono_barcodes"], out, figures=False)
    assert n == 3  # 2 reps @ 64x80 + 1 rep @ 48x96
    assert os.path.exists(os.path.join(out, "tiny_mono_session", "rep1",
                                       "done.flag"))
    wide = json.load(open(os.path.join(out, "tiny_mono_wide", "rep0",
                                       "metrics.json")))
    assert wide["hr_shape"] == [96, 192]


def test_sr_run_band_store_flag(tiny_session, tmp_path, monkeypatch):
    """`sr.run --band-store hybrid` (the production throughput mode) stays
    within the documented +/-1 uint8 of the strict-f32 default on the CLI
    surface, and the flag round-trips through the env contract."""
    from PIL import Image

    from enph459_super_resolution_tpu.sr.run import main

    monkeypatch.setenv("SRTPU_BAND_STORE", "f32")  # restores at teardown
    data_dir = os.path.dirname(tiny_session)
    out_f32 = str(tmp_path / "bs_f32")
    out_hyb = str(tmp_path / "bs_hybrid")
    base = ["--workload", "mono_barcodes", "--data-dir", data_dir,
            "--no-figures"]
    assert main(base + ["--output-dir", out_f32]) == 0
    assert main(base + ["--output-dir", out_hyb,
                        "--band-store", "hybrid"]) == 0
    assert os.environ["SRTPU_BAND_STORE"] == "hybrid"

    rep = os.path.join("tiny_mono_session", "rep0")
    for f in ["native_2x.png", "SAA.png", "SAA_IBP.png"]:
        a = np.asarray(Image.open(os.path.join(out_f32, rep, f)), np.int16)
        b = np.asarray(Image.open(os.path.join(out_hyb, rep, f)), np.int16)
        assert np.max(np.abs(a - b)) <= 1, f
    # the one-shot zoom/SAA operators stay f32 -> bit-identical
    for f in ["native_2x.png", "SAA.png", "LR_mean.png"]:
        a = np.asarray(Image.open(os.path.join(out_f32, rep, f)))
        b = np.asarray(Image.open(os.path.join(out_hyb, rep, f)))
        assert np.array_equal(a, b), f


def test_watch_serve_mode(tiny_session, tmp_path, monkeypatch):
    """`sr.run --watch` keeps serving: processes existing sessions, defers a
    session that fails to load (mid-write by collection), picks it up on a
    later poll once complete, and reloads a processed session when its
    directory listing changes (late-arriving reps) — done.flag keeps the
    already-finished units idempotent."""
    import shutil

    from enph459_super_resolution_tpu.sr import run as run_mod

    data_dir = os.path.dirname(tiny_session)
    out = str(tmp_path / "serve_out")
    broken = os.path.join(data_dir, "tiny_mono_session2")
    os.makedirs(broken)
    with open(os.path.join(broken, "corner0_rep00.png"), "wb") as fp:
        fp.write(b"this is not a png")  # collection still writing

    polls = {"n": 0}

    def fake_sleep(_):
        polls["n"] += 1
        if polls["n"] == 1:
            # between polls the "collection layer" finishes the session...
            shutil.rmtree(broken)
            shutil.copytree(tiny_session, broken)
        elif polls["n"] == 2:
            # ...and later appends a THIRD rep to the first (already
            # processed) session — the fingerprint change must trigger a
            # reload even though the session was once fully processed
            src = os.path.join(tiny_session, "corner0_rep00.png")
            for ci in range(4):
                shutil.copy(src,
                            os.path.join(tiny_session,
                                         f"corner{ci}_rep02.png"))

    monkeypatch.setattr(run_mod.time, "sleep", fake_sleep)
    rc = run_mod.main(["--workload", "mono_barcodes", "--data-dir", data_dir,
                       "--output-dir", out, "--no-figures",
                       "--watch", "0.01", "--watch-polls", "4"])
    assert rc == 0
    for sess in ["tiny_mono_session", "tiny_mono_session2"]:
        assert os.path.exists(
            os.path.join(out, sess, "rep0", "done.flag")), sess
        assert os.path.exists(
            os.path.join(out, sess, "rep1", "done.flag")), sess
    # the late-arriving rep got picked up on a later poll
    assert os.path.exists(
        os.path.join(out, "tiny_mono_session", "rep2", "done.flag"))


@pytest.mark.slow
def test_rgb_barcodes_real_session_loads_and_converges(reference_root):
    """The red-Bayer barcode path on the real dataset: per-rep units load
    with nominal red-LR shifts and IBP converges."""
    import jax.numpy as jnp
    from enph459_super_resolution_tpu.sr import solve

    data = os.path.join(reference_root, "rgb_barcodes/data/"
                        "2_3_5_mil_color_tilt 0.28256_settle50ms")
    cfg = WORKLOADS["rgb_barcodes"]
    units = cfg.load(data)
    assert len(units) >= 2
    u = units[0]
    assert u.frames.shape[0] == 4
    assert u.frames.shape[1] * 2 == 1536  # red plane of a 1536-row sensor
    assert u.shifts == ((0.5, -0.5), (0.5, 0.5), (-0.5, -0.5), (-0.5, 0.5))
    out = solve(jnp.asarray(u.frames), make_gaussian_psf(), u.shifts,
                n_iter=10)
    errs = np.asarray(out["mse_history"])
    assert errs[-1] < errs[0]
