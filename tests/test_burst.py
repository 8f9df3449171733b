"""Burst (multi-frame) fusion: traced-shift resampler, simulation parity
vs the classical forward model, registration, and the training loop.

The learned burst engine (``models.zoo.BurstFusion`` + ``sr.fusion`` +
``train.burst``) solves the reference's actual task — multi-frame SR from
sub-pixel-shifted bursts (``mono_barcodes/run_sr.py:212-240``) — with a
network instead of SAA+IBP, trained on bursts simulated with the same
blur -> shift -> decimate forward model.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enph459_super_resolution_tpu.ops.resample import spline_shift, spline_zoom
from enph459_super_resolution_tpu.ops.resize import keys_shift2d
from enph459_super_resolution_tpu.sr import classical
from enph459_super_resolution_tpu.sr.fusion import (
    NOMINAL_SHIFTS_4,
    fuse,
    register_burst,
    simulate_burst,
)


def _smooth_image(h=48, w=56, seed=0, amp=100.0, offset=120.0):
    """Band-limited test scene: low-frequency sinusoid mixture (analytic)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w))
    terms = []
    for _ in range(4):
        fy, fx = rng.uniform(-1, 1, 2) * (2 * np.pi / 16.0)
        ph = rng.uniform(0, 2 * np.pi)
        a = rng.uniform(0.2, 1.0)
        img += a * np.sin(fy * yy + fx * xx + ph)
        terms.append((a, fy, fx, ph))
    return offset + amp * img / 4.0, terms


def _analytic(terms, yy, xx, amp=100.0, offset=120.0):
    img = np.zeros(np.broadcast_shapes(np.shape(yy), np.shape(xx)))
    for a, fy, fx, ph in terms:
        img = img + a * np.sin(fy * yy + fx * xx + ph)
    return offset + amp * img / 4.0


class TestKeysShift2d:
    def test_integer_shift_exact(self):
        img = jnp.asarray(np.random.default_rng(1).uniform(0, 255, (20, 24)),
                          jnp.float32)
        out = keys_shift2d(img, jnp.asarray([2.0, -3.0]))
        # out[y, x] = in[y - 2, x + 3]; interior comparison
        np.testing.assert_allclose(np.asarray(out)[2:, :-3],
                                   np.asarray(img)[:-2, 3:],
                                   rtol=0, atol=1e-4)

    def test_fractional_shift_matches_analytic(self):
        img, terms = _smooth_image()
        h, w = img.shape
        dy, dx = 0.37, -1.62
        out = np.asarray(keys_shift2d(jnp.asarray(img), jnp.asarray([dy, dx])))
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        want = _analytic(terms, yy - dy, xx - dx)
        # interior (away from the 'nearest' boundary band)
        np.testing.assert_allclose(out[4:-4, 4:-4], want[4:-4, 4:-4],
                                   rtol=0, atol=0.05)

    def test_matches_spline_shift_on_smooth(self):
        """Keys cubic vs scipy-parity B-spline: same task, both C1 cubics —
        interior agreement on band-limited data is sub-0.2/255."""
        img, _ = _smooth_image(seed=3)
        shift = (0.5, 0.5)
        a = np.asarray(keys_shift2d(jnp.asarray(img), jnp.asarray(shift)))
        b = np.asarray(spline_shift(jnp.asarray(img), shift))
        np.testing.assert_allclose(a[6:-6, 6:-6], b[6:-6, 6:-6],
                                   rtol=0, atol=0.2)

    def test_traced_shift_single_compile(self):
        """The shift is data, not config: new shifts reuse the jitted
        program (the whole point vs ops.resample's static-shift FIRs)."""
        f = jax.jit(keys_shift2d)
        img = jnp.ones((16, 16), jnp.float32)
        f(img, jnp.asarray([0.3, 0.4])).block_until_ready()
        n0 = f._cache_size()
        f(img, jnp.asarray([-1.2, 0.9])).block_until_ready()
        assert f._cache_size() == n0

    def test_differentiable_wrt_shift(self):
        img, _ = _smooth_image(h=24, w=24, seed=5)
        img_j = jnp.asarray(img, jnp.float32)

        def loss(s):
            return jnp.mean(keys_shift2d(img_j, s)[4:-4, 4:-4] ** 2)

        g = jax.grad(loss)(jnp.asarray([0.25, 0.25], jnp.float32))
        assert np.all(np.isfinite(np.asarray(g))) and np.any(np.asarray(g) != 0)

    def test_flat_field_preserved(self):
        """Partition of unity: constants pass through any sub-pixel shift."""
        img = jnp.full((12, 12), 77.0, jnp.float32)
        out = keys_shift2d(img, jnp.asarray([0.71, -0.29]))
        np.testing.assert_allclose(np.asarray(out), 77.0, rtol=0, atol=1e-3)


class TestBurstSimulation:
    def test_simulate_matches_classical_forward_model(self):
        """Frame-for-frame parity with sr.classical.forward_model (the
        scipy-exact path) on band-limited data: the only difference is
        Keys cubic vs B-spline interpolation."""
        img, _ = _smooth_image(h=64, w=64, seed=7)
        hr = jnp.asarray(img, jnp.float32)
        psf = jnp.asarray(classical.make_gaussian_psf(), jnp.float32)
        shifts = np.asarray(NOMINAL_SHIFTS_4, np.float32)
        lr = np.asarray(simulate_burst(hr, jnp.asarray(shifts), psf, 2))
        for i, s in enumerate(shifts):
            ref = np.asarray(classical.forward_model(
                hr, psf, (float(s[0]), float(s[1])), 2))
            np.testing.assert_allclose(lr[i][3:-3, 3:-3], ref[3:-3, 3:-3],
                                       rtol=0, atol=0.2)

    def test_noise_and_clip(self):
        img, _ = _smooth_image(h=32, w=32, seed=9)
        hr = jnp.asarray(img, jnp.float32)
        psf = jnp.asarray(classical.make_gaussian_psf(), jnp.float32)
        shifts = jnp.asarray(NOMINAL_SHIFTS_4)
        clean = simulate_burst(hr, shifts, psf, 2)
        noisy = simulate_burst(hr, shifts, psf, 2, noise_sigma=3.0,
                               key=jax.random.PRNGKey(0))
        d = np.asarray(noisy - clean)
        assert 1.0 < d.std() < 5.0
        assert float(jnp.min(noisy)) >= 0.0 and float(jnp.max(noisy)) <= 255.0

    def test_register_zero_shift_is_zoom(self):
        img, _ = _smooth_image(h=24, w=28, seed=11)
        lr = jnp.asarray(img, jnp.float32)[None]
        reg = register_burst(lr, jnp.zeros((1, 2)), 2)
        assert reg.shape == (48, 56, 1)
        np.testing.assert_allclose(np.asarray(reg[..., 0]),
                                   np.asarray(spline_zoom(lr, 2)[0]),
                                   rtol=0, atol=1e-3)

    def test_registered_mean_matches_shift_and_add(self):
        """mean over the registered stack == classical SAA (interior),
        given the same static shifts."""
        img, _ = _smooth_image(h=40, w=40, seed=13)
        hr = jnp.asarray(img, jnp.float32)
        psf = jnp.asarray(classical.make_gaussian_psf(), jnp.float32)
        lr = simulate_burst(hr, jnp.asarray(NOMINAL_SHIFTS_4), psf, 2)
        reg = register_burst(lr, jnp.asarray(NOMINAL_SHIFTS_4), 2)
        saa = classical.shift_and_add(lr, NOMINAL_SHIFTS_4, 2)
        np.testing.assert_allclose(np.asarray(reg.mean(-1))[6:-6, 6:-6],
                                   np.asarray(saa)[6:-6, 6:-6],
                                   rtol=0, atol=0.5)


class TestBurstFusionModel:
    def test_zeroed_net_reproduces_stack_mean(self):
        """Residual head: a zero-weight net IS shift-and-add, so training
        starts from the classical SAA estimate rather than from scratch."""
        from enph459_super_resolution_tpu.models import create_model

        model = create_model("burstfusion", n_frames=4, n_feats=8,
                             n_resblocks=1)
        x = jnp.asarray(
            np.random.default_rng(0).uniform(0, 255, (1, 16, 16, 4)),
            jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)
        # the head conv is zero-initialized, so the FRESH model already
        # reproduces SAA — training starts from the classical estimate
        out = model.apply(params, x)
        np.testing.assert_allclose(np.asarray(out[..., 0]),
                                   np.asarray(x.mean(-1)), rtol=0, atol=1e-4)

    def test_fuse_shapes_and_range(self):
        from enph459_super_resolution_tpu.models import create_model

        model = create_model("burstfusion", n_frames=4, n_feats=8,
                             n_resblocks=1)
        lr = jnp.asarray(
            np.random.default_rng(1).uniform(0, 255, (4, 12, 14)),
            jnp.float32)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 24, 28, 4), jnp.float32))
        sr = fuse(model.apply, params, lr, jnp.asarray(NOMINAL_SHIFTS_4), 2)
        assert sr.shape == (24, 28)
        assert float(sr.min()) >= 0.0 and float(sr.max()) <= 255.0


class TestFusionProductSurface:
    def test_sr_run_fusion_flag(self, tmp_path):
        """sr.run --fusion-run drives the learned engine on a real session
        layout: fusion.png + forward-model MSE land alongside the untouched
        classical artifact schema."""
        import scipy.ndimage as ndi

        from enph459_super_resolution_tpu.data.io import save_png
        from enph459_super_resolution_tpu.sr.fusion import FusionEngine
        from enph459_super_resolution_tpu.sr.run import main as sr_main
        from enph459_super_resolution_tpu.train.burst import train_burst

        run_dir = str(tmp_path / "burst_run")
        train_burst(steps=2, batch=2, lr_patch=12, pool_images=10,
                    out_dir=run_dir, eval_every=2, ckpt_every=2, seed=0)

        rng = np.random.default_rng(0)
        scene = ndi.gaussian_filter(rng.uniform(0, 255, (48, 64)), 1.2)
        sdir = tmp_path / "data" / "tiny_session"
        sdir.mkdir(parents=True)
        for ci in range(4):
            for ri in range(2):
                img = np.clip(scene + rng.normal(0, 1, scene.shape),
                              0, 255).astype(np.uint8)
                save_png(img, str(sdir / f"corner{ci}_rep{ri:02d}.png"))

        out = str(tmp_path / "results")
        assert sr_main(["--workload", "mono_barcodes",
                        "--data-dir", str(tmp_path / "data"),
                        "--output-dir", out, "--no-figures",
                        "--fusion-run", run_dir]) == 0
        rep0 = tmp_path / "results" / "tiny_session" / "rep0"
        for f in ("native_2x.png", "SAA.png", "SAA_IBP.png", "fusion.png",
                  "metrics.json", "done.flag"):
            assert (rep0 / f).exists(), f
        metrics = json.loads((rep0 / "metrics.json").read_text())
        assert np.isfinite(metrics["fusion_forward_mse"])
        assert "fusion" in metrics["timings_s"]
        # a freshly-initialized net IS shift-and-add; reprojecting SAA
        # through the forward model lands in the classical solve's error
        # ballpark (same order as the IBP start, well above its end)
        assert metrics["fusion_forward_mse"] > metrics["final_mse"]

        eng = FusionEngine(run_dir)
        with pytest.raises(ValueError):
            eng.check(3, 2)
        with pytest.raises(ValueError):
            eng.check(4, 4)


class TestBurstTraining:
    def test_train_burst_smoke(self, tmp_path):
        """Tiny end-to-end run: trains, checkpoints, evaluates all four
        engines (bicubic/SAA/IBP/fusion) head-to-head, and IBP beats the
        bicubic mean-frame baseline as it must."""
        from enph459_super_resolution_tpu.train.burst import train_burst

        out = train_burst(steps=4, batch=2, lr_patch=12, pool_images=10,
                          noise=1.0, jitter=0.03, out_dir=str(tmp_path),
                          eval_every=4, ckpt_every=4, seed=0)
        for k in ("psnr_bicubic", "psnr_saa", "psnr_ibp", "psnr_fusion"):
            assert np.isfinite(out[k]), out
        assert out["psnr_ibp"] > out["psnr_bicubic"]
        cfg = json.loads((tmp_path / "config.json").read_text())
        assert cfg["model"] == "burstfusion" and cfg["frames"] == 4
        assert (tmp_path / "final_eval.json").exists()

    def test_evaluate_burst_classical_false_skips_classical(self):
        """classical=False must actually skip the SAA/IBP comparison (a
        round-3 bug shadowed the flag with a module import, so every
        intermediate training eval silently ran the full 80-iter IBP)."""
        from enph459_super_resolution_tpu.train.burst import evaluate_burst

        rng = np.random.default_rng(5)
        scenes = [rng.uniform(0, 255, (40, 40)).astype(np.float32)]
        out = evaluate_burst(None, None, scenes, n_iter=4, shave=4,
                             classical=False)
        assert "psnr_bicubic" in out
        assert "psnr_saa" not in out and "psnr_ibp" not in out
        out2 = evaluate_burst(None, None, scenes, n_iter=4, shave=4,
                              classical=True)
        assert "psnr_saa" in out2 and "psnr_ibp" in out2

    def test_burst_gen_shapes(self):
        from enph459_super_resolution_tpu.train.burst import make_burst_gen

        psf = classical.make_gaussian_psf()
        gen = jax.jit(make_burst_gen(NOMINAL_SHIFTS_4, 2, psf, 1.0, 0.05,
                                     margin_lr=4))
        hr = jnp.asarray(
            np.random.default_rng(2).uniform(0, 255, (2, 40, 40)),
            jnp.float32)
        stack, tgt = gen(hr, jax.random.PRNGKey(3))
        assert stack.shape == (2, 24, 24, 4)
        assert tgt.shape == (2, 24, 24, 1)
        assert np.all(np.isfinite(np.asarray(stack)))
        # registration uses NOMINAL shifts while truth carries jitter:
        # the stack mean is still within a few counts of the target
        assert float(jnp.abs(stack.mean() - tgt.mean())) < 10.0


def test_train_burst_data_dir_pool(tmp_path):
    """--data-dir trains on tiles cut from real images (the field-adaptation
    recipe): the pool comes from the checked-in HR fixture, training runs,
    and config.json records the provenance."""
    import json as _json

    from enph459_super_resolution_tpu.train.burst import _tile_pool, train_burst

    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "eval_hr")
    run_dir = str(tmp_path / "field_run")
    final = train_burst(steps=2, batch=2, lr_patch=12, pool_images=8,
                        out_dir=run_dir, eval_every=2, ckpt_every=2,
                        seed=0, data_dir=fixture, tile=64)
    assert np.isfinite(final["psnr_fusion"])
    cfg = _json.load(open(os.path.join(run_dir, "config.json")))
    assert cfg["data_dir"] == fixture and cfg["tile"] == 64

    # tiling invariants: uniform tiles, raised to the crop size when small
    from enph459_super_resolution_tpu.train.data import image_pool_from_dir
    tiles = _tile_pool(image_pool_from_dir(fixture, channels=1), 64)
    assert all(t.shape == (64, 64, 1) for t in tiles)
    with pytest.raises(ValueError):
        _tile_pool(image_pool_from_dir(fixture, channels=1), 4096)


def test_fusion_refine_improves_forward_fit(tmp_path):
    """--fusion-refine N (plug-and-play data consistency): Landweber steps
    seeded from the net's output must cut the forward-model MSE toward the
    classical engine's fit, and metrics.json reports both numbers."""
    import scipy.ndimage as ndi

    from enph459_super_resolution_tpu.data.io import save_png
    from enph459_super_resolution_tpu.sr.run import main as sr_main
    from enph459_super_resolution_tpu.train.burst import train_burst

    run_dir = str(tmp_path / "burst_run")
    train_burst(steps=2, batch=2, lr_patch=12, pool_images=10,
                out_dir=run_dir, eval_every=2, ckpt_every=2, seed=0)

    rng = np.random.default_rng(1)
    scene = ndi.gaussian_filter(rng.uniform(0, 255, (48, 64)), 1.2)
    sdir = tmp_path / "data" / "tiny_session"
    sdir.mkdir(parents=True)
    for ci in range(4):
        img = np.clip(scene + rng.normal(0, 1, scene.shape),
                      0, 255).astype(np.uint8)
        save_png(img, str(sdir / f"corner{ci}_rep00.png"))

    out = str(tmp_path / "results")
    assert sr_main(["--workload", "mono_barcodes",
                    "--data-dir", str(tmp_path / "data"),
                    "--output-dir", out, "--no-figures",
                    "--fusion-run", run_dir, "--fusion-refine", "15"]) == 0
    metrics = json.loads(
        (tmp_path / "results" / "tiny_session" / "rep0" /
         "metrics.json").read_text())
    raw = metrics["fusion_forward_mse_raw"]
    refined = metrics["fusion_forward_mse"]
    assert np.isfinite(raw) and np.isfinite(refined)
    # This session's frames carry NO true shifts (inconsistent
    # observations), so the joint data term has a high floor the classical
    # IBP80 also sits on — the refined output must land at or below the
    # classical engine's own fit, well under the raw net output
    assert refined < 0.6 * raw
    assert refined <= metrics["final_mse"]
