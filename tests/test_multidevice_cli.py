"""Multi-device paths on the PRODUCT surfaces (round-3: VERDICT weak #3).

``sr.run --sp N`` routes each unit's IBP through the halo-exchanged
spatially-sharded solver; ``train.loop --mesh dp=2,sp=2,tp=2`` trains over
an explicit mesh with TP-sharded params.  Driven on the 8-virtual-device
CPU mesh (conftest).
"""

import json
import os

import numpy as np
import pytest
import scipy.ndimage as ndi

from enph459_super_resolution_tpu.parallel import parse_mesh_spec


def test_parse_mesh_spec():
    assert parse_mesh_spec("dp=2,tp=2") == {"dp": 2, "tp": 2}
    assert parse_mesh_spec("dp=2 x sp=2 x tp=2") == {"dp": 2, "sp": 2,
                                                     "tp": 2}
    assert parse_mesh_spec("dp=2,pp=4") == {"dp": 2, "pp": 4}
    with pytest.raises(ValueError):
        parse_mesh_spec("cp=2")
    with pytest.raises(ValueError):
        parse_mesh_spec("dp=2,dp=4")
    with pytest.raises(ValueError):
        parse_mesh_spec("")


@pytest.fixture()
def tall_session(tmp_path):
    """One-rep corner session tall enough for sp=2 tiles (128 LR rows)."""
    from enph459_super_resolution_tpu.data.io import save_png

    rng = np.random.default_rng(7)
    scene = ndi.gaussian_filter(rng.uniform(0, 255, (128, 64)), 1.2)
    sdir = tmp_path / "data" / "tall_mono_session"
    os.makedirs(sdir)
    for ci in range(4):
        img = np.clip(scene + rng.normal(0, 1, scene.shape), 0,
                      255).astype(np.uint8)
        save_png(img, str(sdir / f"corner{ci}_rep00.png"))
    return str(tmp_path / "data")


def test_sr_run_sp_flag_matches_unsharded(tall_session, tmp_path):
    from PIL import Image

    from enph459_super_resolution_tpu.sr.run import main

    out1 = str(tmp_path / "out_sp1")
    out2 = str(tmp_path / "out_sp2")
    base = ["--workload", "mono_barcodes", "--data-dir", tall_session,
            "--no-figures"]
    assert main(base + ["--output-dir", out1]) == 0
    assert main(base + ["--output-dir", out2, "--sp", "2"]) == 0

    rep = os.path.join("tall_mono_session", "rep0")
    for f in ["native_2x.png", "SAA.png", "SAA_IBP.png", "LR_mean.png",
              "done.flag"]:
        assert os.path.exists(os.path.join(out2, rep, f)), f
    for f in ["native_2x.png", "SAA.png", "SAA_IBP.png"]:
        a = np.asarray(Image.open(os.path.join(out1, rep, f)), np.int16)
        b = np.asarray(Image.open(os.path.join(out2, rep, f)), np.int16)
        # sp path runs the conv-op engine vs the banded-mm default: scipy
        # parity holds for both, uint8 truncation ties allowed
        assert np.max(np.abs(a - b)) <= 1, f

    m1 = json.load(open(os.path.join(out1, rep, "metrics.json")))
    m2 = json.load(open(os.path.join(out2, rep, "metrics.json")))
    np.testing.assert_allclose(m2["mse_history"], m1["mse_history"],
                               rtol=1e-3)


def test_train_mesh_flag_dp_sp_tp(tmp_path):
    """Full train step over an explicit dp=2,sp=2,tp=2 mesh from the CLI
    surface; params TP-sharded, batch dp-sharded, patch rows sp-sharded."""
    from enph459_super_resolution_tpu.train.loop import train

    out = str(tmp_path / "mesh_run")
    final = train(model_name="espcn", scale=2, channels=3, steps=4, batch=4,
                  lr_patch=16, eval_every=4, ckpt_every=4, out_dir=out,
                  pool_images=4, mesh_spec="dp=2,sp=2,tp=2")
    assert np.isfinite(final["psnr"])
    metrics = [json.loads(l) for l in
               open(os.path.join(out, "metrics.jsonl"))]
    assert metrics and all(np.isfinite(m["loss"]) for m in metrics)


def test_train_mesh_flag_matches_single_device(tmp_path):
    """Same seed, same data: a dp=2,tp=2-mesh run's loss trajectory must
    match the single-device run to float tolerance (the sharding changes
    the schedule of the math, not the math)."""
    from enph459_super_resolution_tpu.train.loop import train

    def losses(out, spec):
        train(model_name="espcn", scale=2, channels=1, steps=4, batch=8,
              lr_patch=12, eval_every=4, ckpt_every=4, out_dir=out,
              pool_images=4, dp=False, mesh_spec=spec, resume=False)
        return [json.loads(l)["loss"]
                for l in open(os.path.join(out, "metrics.jsonl"))]

    single = losses(str(tmp_path / "r1"), None)
    meshed = losses(str(tmp_path / "r2"), "dp=2,tp=2")
    np.testing.assert_allclose(meshed, single, rtol=2e-4)


def test_train_mesh_flag_pp_matches_single_device(tmp_path):
    """train.loop --mesh dp=2,pp=4 (EDSR scan-trunk pipeline): the loss
    trajectory must match the single-device run on the same stacked-layout
    model to float tolerance."""
    from enph459_super_resolution_tpu.train.loop import train

    def losses(out, spec):
        train(model_name="edsr", scale=2, channels=3, steps=4, batch=8,
              lr_patch=12, eval_every=4, ckpt_every=4, out_dir=out,
              pool_images=4, dp=False, mesh_spec=spec, resume=False,
              model_kwargs={"n_resblocks": 4, "n_feats": 8,
                            "scan_trunk": True})
        return [json.loads(l)["loss"]
                for l in open(os.path.join(out, "metrics.jsonl"))]

    single = losses(str(tmp_path / "r1"), None)
    piped = losses(str(tmp_path / "r2"), "dp=2,pp=4")
    np.testing.assert_allclose(piped, single, rtol=2e-4)
