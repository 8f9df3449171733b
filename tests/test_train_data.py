"""Resize protocol + data pipeline + short end-to-end training runs."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enph459_super_resolution_tpu.ops.resize import (
    bicubic_degrade, bicubic_upsample, resize,
)
from enph459_super_resolution_tpu.train.data import (
    PatchConfig, PatchSampler, evaluate_sr, synthetic_scene_pool,
)

RNG = np.random.default_rng(9)


def test_resize_identity():
    img = jnp.asarray(RNG.uniform(0, 255, (24, 30)), jnp.float32)
    out = resize(img, (24, 30))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-3)


def test_resize_constant_preserved():
    img = jnp.full((16, 20, 3), 127.0, jnp.float32)
    up = resize(img, (64, 80))
    np.testing.assert_allclose(np.asarray(up), 127.0, atol=1e-3)
    dn = resize(img, (4, 5))
    np.testing.assert_allclose(np.asarray(dn), 127.0, atol=1e-3)


def test_degrade_antialias_beats_naive_on_highfreq():
    """Antialiased downsample must suppress aliasing energy vs plain
    decimation on a high-frequency pattern."""
    x = np.zeros((64, 64), np.float32)
    x[:, ::2] = 255.0  # Nyquist-rate stripes
    lr_aa = np.asarray(bicubic_degrade(jnp.asarray(x), 4))
    assert abs(lr_aa.mean() - x.mean()) < 2.0
    assert lr_aa.std() < 12.0  # stripes average out, little alias energy
    lr_naive = x[::4, ::4]
    assert lr_naive.std() < 1.0 and abs(lr_naive.mean() - 255.0) < 1e-6


def test_resize_matches_pil_bicubic_protocol():
    """Cross-check against PIL's antialiased BICUBIC: weights must match
    exactly in the interior; only the boundary convention differs (PIL
    clamps edge pixels, we use MATLAB-imresize symmetric reflection)."""
    from PIL import Image
    from enph459_super_resolution_tpu.ops.resize import resize_matrix

    n_in, n_out = 48, 12
    mine = resize_matrix(n_in, n_out, dtype_name="float64")
    pil = np.zeros((n_out, n_in))
    for j in range(n_in):
        x = np.zeros((1, n_in), np.float32)
        x[0, j] = 100.0
        im = Image.fromarray(x, mode="F").resize((n_out, 1), Image.BICUBIC)
        pil[:, j] = np.asarray(im)[0] / 100.0
    np.testing.assert_allclose(mine[2:-2], pil[2:-2], atol=1e-6)


def test_patch_sampler_shapes_and_range():
    pool = synthetic_scene_pool(n_images=3, size=128, channels=3)
    sampler = PatchSampler(pool, PatchConfig(scale=4, lr_patch=12, batch=4))
    lr, hr = next(sampler)
    assert hr.shape == (4, 48, 48, 3)
    assert lr.shape == (4, 12, 12, 3)
    assert float(jnp.max(hr)) <= 255.0 + 1e-3
    lr2, hr2 = next(sampler)
    assert not np.allclose(np.asarray(hr), np.asarray(hr2))


def test_device_patch_sampler_matches_host_protocol():
    """DevicePatchSampler: same shapes/dtypes/degradation protocol as the
    host sampler, pool resident on device, varied batches; falls back to
    the host sampler for ragged pools."""
    from enph459_super_resolution_tpu.train.data import (DevicePatchSampler,
                                                         make_patch_sampler)

    pool = synthetic_scene_pool(n_images=3, size=128, channels=3)
    cfg = PatchConfig(scale=4, lr_patch=12, batch=4)
    sampler = make_patch_sampler(pool, cfg)
    assert isinstance(sampler, DevicePatchSampler)
    lr, hr = next(sampler)
    assert hr.shape == (4, 48, 48, 3) and lr.shape == (4, 12, 12, 3)
    assert float(jnp.max(hr)) <= 255.0 + 1e-3
    lr2, hr2 = next(sampler)
    assert not np.allclose(np.asarray(hr), np.asarray(hr2))
    # every crop must be an actual pool crop: degradation of the crop by
    # the shared graph means lr/hr stay consistent
    from enph459_super_resolution_tpu.train.data import bicubic_degrade
    np.testing.assert_allclose(np.asarray(bicubic_degrade(hr, 4)),
                               np.asarray(lr), atol=1e-3)
    # ragged pool -> host sampler
    ragged = [pool[0], pool[1][:96]]
    assert isinstance(make_patch_sampler(ragged, cfg), PatchSampler)


def test_short_training_learns(tmp_path):
    """A short ESPCN x2 run must show clear learning: train loss drops
    hard and eval PSNR climbs toward the bicubic baseline (beating bicubic
    takes thousands of steps; CI budget allows a few hundred)."""
    from enph459_super_resolution_tpu.train.loop import train

    final = train(model_name="espcn", scale=2, steps=300, batch=8,
                  lr_patch=16, learning_rate=3e-3, channels=1,
                  out_dir=str(tmp_path / "run"), eval_every=150,
                  ckpt_every=300, dp=False, seed=1)
    assert np.isfinite(final["psnr"])
    lines = [json.loads(l)
             for l in open(tmp_path / "run" / "metrics.jsonl")]
    assert lines[-1]["loss"] < lines[0]["loss"] * 0.25
    evals = [json.loads(l) for l in open(tmp_path / "run" / "eval.jsonl")]
    assert final["psnr"] >= evals[0]["psnr"] - 0.2  # not regressing
    assert final["psnr"] > 14.0  # far above untrained (~5-10 dB)
    assert os.path.exists(tmp_path / "run" / "final_eval.json")


def test_training_resume_from_checkpoint(tmp_path):
    from enph459_super_resolution_tpu.train.loop import train

    out = str(tmp_path / "resume_run")
    train(model_name="espcn", scale=2, steps=40, batch=4, lr_patch=12,
          channels=1, out_dir=out, eval_every=40, ckpt_every=20, dp=False)
    # second call resumes at 40 and continues to 60
    train(model_name="espcn", scale=2, steps=60, batch=4, lr_patch=12,
          channels=1, out_dir=out, eval_every=60, ckpt_every=20, dp=False)
    lines = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    steps = [l["step"] for l in lines]
    assert max(steps) == 60
    assert any(s <= 40 for s in steps)


def test_natural_scene_pool_statistics():
    """The 'natural' pool (perception-distortion demo): valid images whose
    gradient energy is dominated by stochastic texture above the x4 LR
    Nyquist — the part a Keys-cubic x4 round trip cannot carry — unlike
    the default learnable pool where trained models reach grad_ratio ~0.97
    (RESULTS.md)."""
    from enph459_super_resolution_tpu.train.data import natural_scene_pool

    pool = natural_scene_pool(n_images=3, size=160, channels=3, seed=5)
    assert len(pool) == 3
    for img in pool:
        assert img.shape == (160, 160, 3) and img.dtype == np.float32
        assert img.min() >= 0.0 and img.max() <= 255.0
    assert not np.allclose(pool[0], pool[1])
    # deterministic in the seed (pool split reproducibility across processes)
    again = natural_scene_pool(n_images=3, size=160, channels=3, seed=5)
    np.testing.assert_array_equal(pool[0], again[0])

    def grad_energy(x):
        gy = np.diff(x, axis=0)[:, :-1]
        gx = np.diff(x, axis=1)[:-1, :]
        return float(np.mean(np.hypot(gy, gx)))

    for img in pool:
        hr = jnp.asarray(img)
        bic = bicubic_upsample(bicubic_degrade(hr[None], 4), 4)[0]
        ratio = grad_energy(np.asarray(bic)[..., 0]) / grad_energy(img[..., 0])
        assert ratio < 0.45, f"pool too learnable: bicubic grad ratio {ratio}"


def test_train_loop_pool_kind_natural(tmp_path):
    """--pool natural plumbs through to the training pool."""
    from enph459_super_resolution_tpu.train.loop import train

    final = train(model_name="espcn", scale=2, steps=6, batch=2,
                  lr_patch=12, channels=1, out_dir=str(tmp_path / "nat"),
                  eval_every=6, ckpt_every=6, dp=False,
                  pool_images=8, pool_kind="natural")
    assert np.isfinite(final["psnr"])
    # the natural pool's eval scenes carry unrecoverable texture: bicubic
    # grad_ratio is well below 1 on them
    assert final["bicubic_grad_ratio"] < 0.6


def test_gan_train_step_two_player_learns():
    """ESRGAN fine-tune machinery (BASELINE config #4): the RaGAN two-player
    step must produce finite, moving G/D losses and update both players."""
    import jax
    import jax.numpy as jnp

    from enph459_super_resolution_tpu.models import (
        ESPCN, VGGStyleDiscriminator,
    )
    from enph459_super_resolution_tpu.train import (
        GANBalance, GANTrainState, TrainConfig, TrainState,
        make_gan_train_step, make_optimizer,
    )
    from enph459_super_resolution_tpu.train.losses import PerceptualLoss

    rng = np.random.default_rng(7)
    g = ESPCN(scale=2, channels=1)
    d = VGGStyleDiscriminator(nf=16)
    lr = jnp.asarray(rng.uniform(0, 255, (4, 12, 12, 1)), jnp.float32)
    hr = jnp.repeat(jnp.repeat(lr, 2, axis=1), 2, axis=2)

    g_params = g.init(jax.random.PRNGKey(0), lr)
    d_params = d.init(jax.random.PRNGKey(1), hr)
    cfg = TrainConfig(learning_rate=1e-3)
    g_tx, d_tx = make_optimizer(cfg), make_optimizer(cfg)
    state = GANTrainState(step=jnp.zeros((), jnp.int32),
                          g=TrainState.create(g_params, g_tx),
                          d_params=d_params,
                          d_opt_state=d_tx.init(d_params),
                          balance=GANBalance.create())
    step = jax.jit(make_gan_train_step(g.apply, d.apply, g_tx, d_tx, cfg,
                                       percep_loss=PerceptualLoss()))

    state, m0 = step(state, lr, hr)
    hist = [m0]
    for _ in range(9):
        state, m = step(state, lr, hr)
        hist.append(m)
    for m in hist:
        assert np.isfinite(float(m["g_loss"]))
        assert np.isfinite(float(m["d_loss"]))
        assert np.isfinite(float(m["g_gan"]))  # raw adversarial G term,
        # logged so a saturating D (g_gan stuck near 0 gradient) is visible
        assert np.isfinite(float(m["psnr"]))
    # both players actually move
    assert float(hist[-1]["d_loss"]) != float(hist[0]["d_loss"])
    assert float(hist[-1]["g_loss"]) != float(hist[0]["g_loss"])
    assert int(state.step) == 10
    # D is learning to separate real from fake on this fixed batch:
    # RaGAN D loss starts at ~2*ln2 for an uninformative D and decreases
    assert float(hist[-1]["d_loss"]) < float(hist[0]["d_loss"])
    # G pixel-anchor pulls SR toward HR: PSNR improves over the run
    assert float(hist[-1]["psnr"]) > float(hist[0]["psnr"])


def test_gan_balance_knobs_do_not_recompile():
    """GANBalance knobs are runtime scalars in the state: switching the
    gan_weight=0 ablation on/off, retuning d_lr_scale/d_every/
    instance_noise, must reuse ONE compiled step (a recompile of the
    paper-scale generator costs tens of minutes on the tunneled backend).
    Also pins the semantics: with gan_weight=0 vs >0 the D sees the same
    trajectory inputs but G's params diverge (the adversarial gradient is
    actually applied)."""
    import jax
    import jax.numpy as jnp

    from enph459_super_resolution_tpu.models import (
        ESPCN, VGGStyleDiscriminator,
    )
    from enph459_super_resolution_tpu.train import (
        GANBalance, GANTrainState, TrainConfig, TrainState,
        make_gan_train_step, make_optimizer,
    )

    rng = np.random.default_rng(3)
    g = ESPCN(scale=2, channels=1)
    d = VGGStyleDiscriminator(nf=16)
    lr = jnp.asarray(rng.uniform(0, 255, (2, 12, 12, 1)), jnp.float32)
    hr = jnp.asarray(rng.uniform(0, 255, (2, 24, 24, 1)), jnp.float32)
    g_params = g.init(jax.random.PRNGKey(0), lr)
    d_params = d.init(jax.random.PRNGKey(1), hr)
    cfg = TrainConfig(learning_rate=1e-3)
    g_tx, d_tx = make_optimizer(cfg), make_optimizer(cfg)

    def mk_state(balance):
        return GANTrainState(step=jnp.zeros((), jnp.int32),
                             g=TrainState.create(
                                 jax.tree.map(jnp.copy, g_params), g_tx),
                             d_params=jax.tree.map(jnp.copy, d_params),
                             d_opt_state=d_tx.init(d_params),
                             balance=balance)

    step = jax.jit(make_gan_train_step(g.apply, d.apply, g_tx, d_tx, cfg))

    outs = {}
    for w, dls, de, noise in ((0.0, 1.0, 1, 0.0), (0.5, 0.1, 2, 5.0),
                              (2.0, 0.3, 3, 1.0)):
        st = mk_state(GANBalance.create(gan_weight=w, d_lr_scale=dls,
                                        d_every=de, instance_noise=noise))
        for _ in range(3):
            st, m = step(st, lr, hr)
        outs[w] = jax.tree.map(np.asarray, st.g.params)
        assert np.isfinite(float(m["g_loss"]))
    assert step._cache_size() == 1  # one compile covers every knob setting

    # the adversarial gradient actually moves G: gan_weight=0 vs 2.0 params
    # differ (identical data, seeds, and D init otherwise)
    flat0 = jax.tree.leaves(outs[0.0])
    flat2 = jax.tree.leaves(outs[2.0])
    assert any(np.max(np.abs(a - b)) > 0 for a, b in zip(flat0, flat2))


def test_gan_loop_checkpoint_roundtrip(tmp_path):
    """--gan training writes/resumes a GANTrainState checkpoint (the
    ESRGAN fine-tune path through train.loop)."""
    from enph459_super_resolution_tpu.train.loop import train

    out = str(tmp_path / "gan_run")
    train(model_name="espcn", scale=2, steps=6, batch=2, lr_patch=12,
          channels=1, out_dir=out, eval_every=6, ckpt_every=3, dp=False,
          gan=True)
    # resume from step 6 and continue to 9 with the restored GANTrainState
    train(model_name="espcn", scale=2, steps=9, batch=2, lr_patch=12,
          channels=1, out_dir=out, eval_every=9, ckpt_every=3, dp=False,
          gan=True)
    lines = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    assert any("g_loss" in l and "d_loss" in l and "g_gan" in l
               for l in lines)
    assert max(l["step"] for l in lines) == 9
    final = json.load(open(os.path.join(out, "final_eval.json")))
    # sharpness index reported alongside PSNR/SSIM (GAN-ablation metric);
    # an untrained G can exceed 1 (noise has more gradient energy than HR),
    # but bicubic upsampling is always oversmoothed
    assert np.isfinite(final["grad_ratio"]) and final["grad_ratio"] > 0.0
    assert 0.0 < final["bicubic_grad_ratio"] < 1.0
    assert os.path.exists(os.path.join(out, "final_eval.json"))

    # the standalone evaluate CLI restores the GANTrainState checkpoint
    # (generator under 'g') with its template-free restore
    from enph459_super_resolution_tpu.train.evaluate import main as eval_main

    assert eval_main(["--model", "espcn", "--scale", "2", "--channels", "1",
                      "--run", out]) == 0


def test_steps_per_dispatch_equivalent(tmp_path):
    """k optimizer steps rolled into one lax.scan dispatch produce the
    same training trajectory as k sequential dispatches (same sampler
    stream, same Adam/EMA math)."""
    import orbax.checkpoint as ocp

    from enph459_super_resolution_tpu.train.loop import train

    outs = {}
    for k in (1, 5):
        out = str(tmp_path / f"k{k}")
        train(model_name="espcn", scale=2, steps=10, batch=2, lr_patch=12,
              channels=1, out_dir=out, eval_every=10, ckpt_every=5,
              dp=False, steps_per_dispatch=k)
        mngr = ocp.CheckpointManager(os.path.join(out, "ckpt"))
        assert mngr.latest_step() == 10  # boundary cadence preserved
        outs[k] = mngr.restore(10)

    for a, b in zip(jax.tree.leaves(outs[1]["params"]),
                    jax.tree.leaves(outs[5]["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    for a, b in zip(jax.tree.leaves(outs[1]["ema_params"]),
                    jax.tree.leaves(outs[5]["ema_params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_gan_finetune_init_from_pretrain(tmp_path):
    """--init-from warm-starts the GAN generator from an L1 pretrain run's
    checkpoint (the ESRGAN recipe: PSNR pretrain -> adversarial fine-tune);
    the generator params/EMA must equal the source checkpoint's, not a fresh
    init."""
    import orbax.checkpoint as ocp

    from enph459_super_resolution_tpu.train.loop import train
    from enph459_super_resolution_tpu.train.state import (
        GANTrainState, TrainState)

    pre = str(tmp_path / "pre")
    train(model_name="espcn", scale=2, steps=4, batch=2, lr_patch=12,
          channels=1, out_dir=pre, eval_every=4, ckpt_every=4, dp=False)
    gan = str(tmp_path / "gan")
    train(model_name="espcn", scale=2, steps=2, batch=2, lr_patch=12,
          channels=1, out_dir=gan, eval_every=2, ckpt_every=1, dp=False,
          gan=True, init_from=pre)

    # step-1 GAN checkpoint == pretrain params after exactly one Adam update
    def leaves(tree):
        return jax.tree.leaves(tree)

    pre_mngr = ocp.CheckpointManager(os.path.join(pre, "ckpt"))
    gan_mngr = ocp.CheckpointManager(os.path.join(gan, "ckpt"))
    assert gan_mngr.latest_step() == 2
    pre_state = pre_mngr.restore(pre_mngr.latest_step())
    gan_state = gan_mngr.restore(1)
    for a, b in zip(leaves(pre_state["params"]), leaves(gan_state["g"]["params"])):
        # one optimizer step of drift, not a re-init: Adam moves each weight
        # by at most ~lr (1e-4) per step
        assert np.max(np.abs(np.asarray(a) - np.asarray(b))) < 1e-3

    with pytest.raises(FileNotFoundError):
        train(model_name="espcn", scale=2, steps=1, batch=2, lr_patch=12,
              channels=1, out_dir=str(tmp_path / "x"), dp=False, gan=True,
              init_from=str(tmp_path / "nonexistent"))


def test_vgg19_features_shapes_and_grad():
    """VGG19 extractor: correct per-layer shapes, gradients flow through a
    PerceptualLoss built on it (ESRGAN recipe plumbing)."""
    from enph459_super_resolution_tpu.train.losses import PerceptualLoss
    from enph459_super_resolution_tpu.train.vgg import VGG19Features

    model = VGG19Features(layers=("conv1_2", "conv2_1"))
    x = jnp.asarray(RNG.uniform(0, 255, (1, 16, 16, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    f1, f2 = model.apply(params, x)
    assert f1.shape == (1, 16, 16, 64)     # block 1, pre-pool
    assert f2.shape == (1, 8, 8, 128)      # block 2 after 2x2 maxpool

    ploss = PerceptualLoss(lambda im: model.apply(params, im))
    y = jnp.asarray(RNG.uniform(0, 255, (1, 16, 16, 3)), jnp.float32)
    g = jax.grad(lambda im: ploss(im, y))(x)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0
    # grayscale input replicates to RGB
    f1g, _ = model.apply(params, x[..., :1])
    assert f1g.shape == (1, 16, 16, 64)


def test_vgg19_torch_state_dict_parity():
    """Loading a torchvision-format vgg19 state_dict reproduces torch's own
    conv arithmetic (OIHW->HWIO layout mapping + ImageNet normalization)."""
    torch = pytest.importorskip("torch")
    from enph459_super_resolution_tpu.train.vgg import (
        IMAGENET_MEAN, IMAGENET_STD, VGG19Features, _TORCH_CONV_INDICES,
        conv_names, params_from_torch_state_dict,
    )

    widths = {f"conv{b}_{i + 1}": w
              for b, n, w in ((1, 2, 64), (2, 2, 128), (3, 4, 256),
                              (4, 4, 512), (5, 4, 512)) for i in range(n)}
    tr = np.random.default_rng(3)
    sd, cin = {}, 3
    for name, tidx in zip(conv_names(), _TORCH_CONV_INDICES):
        cout = widths[name]
        sd[f"features.{tidx}.weight"] = torch.tensor(
            tr.normal(0, 0.05, (cout, cin, 3, 3)).astype(np.float32))
        sd[f"features.{tidx}.bias"] = torch.tensor(
            tr.normal(0, 0.05, cout).astype(np.float32))
        cin = cout
    params = params_from_torch_state_dict(sd)

    x = tr.uniform(0, 255, (1, 10, 12, 3)).astype(np.float32)
    ours = np.asarray(VGG19Features(layers=("conv1_1",)).apply(
        params, jnp.asarray(x))[0])

    xn = (x / 255.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    xt = torch.tensor(xn.transpose(0, 3, 1, 2).astype(np.float32))
    ref = torch.nn.functional.conv2d(
        xt, sd["features.0.weight"], sd["features.0.bias"], padding=1)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_network_interpolation(tmp_path, capsys):
    """ESRGAN network interpolation (Wang et al. 2018 §3.4): blending the
    PSNR pretrain with the GAN fine-tune in parameter space is exact at the
    endpoints and leafwise-convex in between; the evaluate CLI exposes it
    via --interp-run/--alpha."""
    from enph459_super_resolution_tpu.train.evaluate import (
        interpolate_weights, load_run_weights, main as eval_main)
    from enph459_super_resolution_tpu.train.loop import train

    pre = str(tmp_path / "pre")
    gan = str(tmp_path / "gan")
    train(model_name="espcn", scale=2, steps=6, batch=2, lr_patch=12,
          channels=1, out_dir=pre, eval_every=6, ckpt_every=6, dp=False)
    train(model_name="espcn", scale=2, steps=6, batch=2, lr_patch=12,
          channels=1, out_dir=gan, eval_every=6, ckpt_every=6, dp=False,
          gan=True, init_from=pre)

    w_pre, _ = load_run_weights(pre)
    w_gan, _ = load_run_weights(gan)
    for a, want in ((0.0, w_pre), (1.0, w_gan)):
        got = interpolate_weights(w_pre, w_gan, a)
        for x, y in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    mid = interpolate_weights(w_pre, w_gan, 0.25)
    for x, p, g in zip(jax.tree.leaves(mid), jax.tree.leaves(w_pre),
                       jax.tree.leaves(w_gan)):
        np.testing.assert_allclose(np.asarray(x),
                                   0.75 * np.asarray(p) + 0.25 * np.asarray(g),
                                   rtol=1e-6, atol=1e-7)

    assert eval_main(["--model", "espcn", "--scale", "2", "--channels", "1",
                      "--run", pre, "--interp-run", gan,
                      "--alpha", "0.5"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["alpha"] == 0.5 and np.isfinite(out["psnr"])


def test_edges_scene_pool_statistics():
    """The 'edges' pool (Set5-like regime): piecewise-smooth scenes whose
    above-Nyquist energy is deterministic edge continuation — the x4
    round trip keeps most of the gradient energy (unlike 'natural'), so
    small models can post their literature-scale wins on it."""
    from enph459_super_resolution_tpu.train.data import (POOL_KINDS,
                                                         edges_scene_pool)

    assert POOL_KINDS["edges"] is edges_scene_pool
    pool = edges_scene_pool(n_images=3, size=160, channels=3, seed=5)
    assert len(pool) == 3
    for img in pool:
        assert img.shape == (160, 160, 3) and img.dtype == np.float32
        assert img.min() >= 0.0 and img.max() <= 255.0
    assert not np.allclose(pool[0], pool[1])
    again = edges_scene_pool(n_images=3, size=160, channels=3, seed=5)
    np.testing.assert_array_equal(pool[0], again[0])

    def grad_energy(x):
        gy = np.diff(x, axis=0)[:, :-1]
        gx = np.diff(x, axis=1)[:-1, :]
        return float(np.mean(np.hypot(gy, gx)))

    for img in pool:
        hr = jnp.asarray(img)
        bic = bicubic_upsample(bicubic_degrade(hr[None], 4), 4)[0]
        ratio = grad_energy(np.asarray(bic)[..., 0]) / grad_energy(img[..., 0])
        # edges survive the x4 round trip far better than stochastic
        # texture (natural pool asserts < 0.45 here) yet are NOT fully
        # carried (else there would be nothing for a model to add)
        assert 0.5 < ratio < 0.98, f"edge-regime ratio out of band: {ratio}"
