"""Benchmark-dataset eval protocol driven through REAL file ingestion.

BASELINE.json's quality metric is Set5/Set14-protocol PSNR/SSIM (Y channel,
border shave = scale).  No benchmark datasets exist in this environment, so
``tests/fixtures/eval_hr/`` checks in a tiny deterministic HR directory
(procedural scenes, odd sizes so the multiple-of-scale crop is exercised,
one grayscale file so channel coercion is exercised) and this module pins
the full ``--data-dir`` path: directory ingestion -> Keys-cubic degradation
-> model -> Y-channel shaved metrics.

With a real Set5 directory the same one-command check applies; literature
anchors for ``bicubic_psnr`` there: x2 = 33.66 dB, x3 = 30.39 dB,
x4 = 28.42 dB (so parity is checkable the day datasets are present).
"""

import json
import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "eval_hr")

# bicubic-baseline anchors for the checked-in fixture pool (Y channel,
# shave=scale), pinned from the implementation at check-in time
FIXTURE_BICUBIC_PSNR = {2: 19.5156, 4: 18.8267}


def test_image_pool_from_dir_ingestion():
    from enph459_super_resolution_tpu.train.data import image_pool_from_dir

    rgb = image_pool_from_dir(FIXTURE, channels=3)
    assert [p.shape for p in rgb] == [(100, 95, 3), (97, 99, 3), (94, 100, 3)]
    assert all(p.dtype == np.float32 for p in rgb)
    # grayscale file replicated to 3 channels
    assert np.ptp(rgb[0][..., 0] - rgb[0][..., 1]) == 0.0
    # rgb files averaged down to 1 channel
    gray = image_pool_from_dir(FIXTURE, channels=1)
    assert [p.shape[-1] for p in gray] == [1, 1, 1]
    with pytest.raises(FileNotFoundError):
        image_pool_from_dir(os.path.join(FIXTURE, os.pardir), channels=3)


@pytest.mark.parametrize("scale", [2, 4])
def test_fixture_bicubic_anchor(scale):
    """The Set5-protocol pipeline on real files reproduces its pinned
    bicubic anchor (the exact analogue of 'Set5 x4 bicubic = 28.42 dB')."""
    from enph459_super_resolution_tpu.ops.resize import bicubic_upsample
    from enph459_super_resolution_tpu.train.data import (evaluate_sr,
                                                         image_pool_from_dir)

    pool = image_pool_from_dir(FIXTURE, channels=3)
    m = evaluate_sr(lambda p, lr: bicubic_upsample(lr, scale), None, pool,
                    scale)
    assert m["n_images"] == 3
    assert m["psnr"] == pytest.approx(FIXTURE_BICUBIC_PSNR[scale], abs=0.02)
    assert m["bicubic_psnr"] == pytest.approx(m["psnr"], abs=1e-6)
    assert 0.0 < m["ssim"] < 1.0


def test_evaluate_cli_data_dir(tmp_path, capsys):
    """End-to-end: train 4 steps, then the evaluate CLI ingests the fixture
    DIRECTORY (the BASELINE.json benchmark entry point)."""
    from enph459_super_resolution_tpu.train import evaluate as eval_cli
    from enph459_super_resolution_tpu.train.loop import train

    run = tmp_path / "run"
    train(model_name="espcn", scale=2, channels=3, steps=4, batch=8,
          lr_patch=12, eval_every=4, ckpt_every=4, out_dir=str(run),
          pool_images=4)
    rc = eval_cli.main(["--model", "espcn", "--scale", "2", "--channels",
                        "3", "--run", str(run), "--data-dir", FIXTURE])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["n_images"] == 3
    assert rec["bicubic_psnr"] == pytest.approx(
        FIXTURE_BICUBIC_PSNR[2], abs=0.02)
    assert np.isfinite(rec["psnr"]) and 0.0 <= rec["ssim"] <= 1.0
