"""Burst-fusion training: learn the reference's multi-frame SR task.

Classical SAA+IBP (``sr.classical``) inverts the burst forward model
analytically given the calibrated shifts and PSF.  This trainer learns the
inversion instead (``models.zoo.BurstFusion`` on the registered stack from
``sr.fusion``), on bursts simulated with the *same* forward model — so the
learned engine can be benchmarked head-to-head against SAA/IBP on held-out
scenes, both given only the NOMINAL (calibration) shifts while the true
shifts carry jitter and the sensor adds read noise (the real rig's
conditions: SURVEY.md §6 pegs shift repeatability at sigma ~0.004-0.07 px).

    python -m enph459_super_resolution_tpu.train.burst \
        --steps 20000 --noise 2.0 --jitter 0.05 --out /tmp/burst_run

Evaluation (also standalone via ``--eval-only``) reports PSNR for bicubic /
SAA / IBP / fusion on the same bursts.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..sr.fusion import (NOMINAL_SHIFTS_4, REGISTER_FNS, fuse,
                         register_burst, simulate_burst)

#: --arch CLI value -> (zoo model name, registration grid of the stack)
ARCHS = {"hr": "burstfusion", "lr": "burstfusion_lr"}


def make_burst_gen(nominal, factor: int, psf, noise_sigma: float,
                   jitter_sigma: float, margin_lr: int = 6,
                   model_name: str = "burstfusion"):
    """Build the jitted batch generator.

    ``gen(hr_patches[B, Hp, Wp], key) -> (stack, target[B, H, W, 1])``
    where ``stack`` is the model's registered input —
    ``[B, H, W, N]`` on the HR grid for ``burstfusion``,
    ``[B, h, w, N*f^2]`` polyphase for ``burstfusion_lr``
    (:data:`~..sr.fusion.REGISTER_FNS`).

    True shifts = nominal + N(0, jitter) per burst; frames carry Gaussian
    read noise; registration uses only the NOMINAL shifts (training bakes
    in robustness to the residual misregistration).  A ``margin_lr`` LR-px
    border is cropped from both stack and target so boundary resampling
    artifacts never enter the loss.
    """
    register = REGISTER_FNS[model_name]
    lr_grid = model_name == "burstfusion_lr"
    nom = jnp.asarray(nominal, jnp.float32)
    psf_j = jnp.asarray(psf, jnp.float32)
    m = margin_lr * factor
    ms = margin_lr if lr_grid else m  # stack crop in its own grid units

    def gen(hr, key):
        b = hr.shape[0]
        kj, kn = jax.random.split(key)
        true = nom[None] + jitter_sigma * jax.random.normal(
            kj, (b,) + nom.shape, jnp.float32)
        keys = jax.random.split(kn, b)
        lr = jax.vmap(
            lambda h, s, k: simulate_burst(h, s, psf_j, factor,
                                           noise_sigma, k))(hr, true, keys)
        stack = jax.vmap(lambda l: register(l, nom, factor))(lr)
        stack = stack[:, ms:stack.shape[1] - ms, ms:stack.shape[2] - ms, :]
        tgt = hr[:, m:hr.shape[1] - m, m:hr.shape[2] - m, None]
        return stack, tgt

    return gen


@functools.partial(jax.jit, static_argnames=("hp", "batch"))
def _crop_hr_batch(pool_arr, key, hp: int, batch: int):
    """Device-resident random HR crops + flip/rot augmentation (mono)."""
    p, h, w = pool_arr.shape
    kimg, ky, kx, kf = jax.random.split(key, 4)
    idx = jax.random.randint(kimg, (batch,), 0, p)
    ys = jax.random.randint(ky, (batch,), 0, h - hp + 1)
    xs = jax.random.randint(kx, (batch,), 0, w - hp + 1)
    crops = jax.vmap(lambda i, y, x: jax.lax.dynamic_slice(
        pool_arr[i], (y, x), (hp, hp)))(idx, ys, xs)
    flips = jax.random.bernoulli(kf, shape=(batch, 3))
    crops = jnp.where(flips[:, 0, None, None], jnp.flip(crops, 1), crops)
    crops = jnp.where(flips[:, 1, None, None], jnp.flip(crops, 2), crops)
    crops = jnp.where(flips[:, 2, None, None],
                      jnp.rot90(crops, axes=(1, 2)), crops)
    return crops


def evaluate_burst(apply_fn, params, scenes: Sequence[np.ndarray],
                   nominal=NOMINAL_SHIFTS_4, factor: int = 2,
                   psf=None, noise_sigma: float = 2.0,
                   jitter_sigma: float = 0.05, n_iter: int = 80,
                   shave: int = 12, seed: int = 1234,
                   classical: bool = True, refine: int = 0,
                   refine_step: float = 2.0,
                   register=register_burst) -> dict:
    """Head-to-head burst-SR evaluation on held-out scenes.

    Each scene is the HR ground truth; its burst is simulated with TRUE
    shifts = nominal + jitter and read noise, then every engine gets only
    the NOMINAL shifts (the field condition).  Returns mean PSNR and SSIM
    (border-shaved) for bicubic LR-mean upsample / SAA / IBP / fusion
    (+ ``fusionref`` when ``refine > 0``: the fusion output after that
    many data-consistency Landweber iterations — quantifies the
    prior-vs-data-fit tradeoff against ground truth).

    The whole per-scene evaluation — burst simulation, all four engines,
    both metrics — is ONE jitted graph with a single small fetch per
    scene: on the tunneled backend an eager classical solve pays the
    ~0.5 s dispatch RTT hundreds of times per scene (PERF_NOTES).
    """
    import functools

    from ..eval.metrics import ssim as ssim_fn
    from ..ops import spline_zoom
    from ..sr import classical as _classical  # keep the `classical` flag visible

    if psf is None:
        psf = _classical.make_gaussian_psf()
    psf_j = jnp.asarray(psf, jnp.float32)
    nom = jnp.asarray(nominal, jnp.float32)
    nominal_static = tuple((float(dy), float(dx)) for dy, dx in nominal)
    key = jax.random.PRNGKey(seed)

    @functools.partial(jax.jit, static_argnames=())
    def eval_scene(params_arg, hr_true, k):
        kj, kn = jax.random.split(k)
        true = nom + jitter_sigma * jax.random.normal(kj, nom.shape)
        lr = simulate_burst(hr_true, true, psf_j, factor, noise_sigma, kn)
        rows = {"bicubic": jnp.clip(
            spline_zoom(jnp.mean(lr, axis=0), factor), 0, 255)}
        if classical:
            saa = jnp.clip(
                _classical.shift_and_add(lr, nominal_static, factor), 0, 255)
            rows["saa"] = saa
            rows["ibp"], _ = _classical.ibp(lr, nominal_static, psf_j, saa,
                                            factor, n_iter=n_iter)
        if apply_fn is not None:
            rows["fusion"] = fuse(apply_fn, params_arg, lr, nom, factor,
                                  register=register)
            if refine > 0:
                from ..sr.fusion import data_consistency_refine

                rows["fusionref"] = data_consistency_refine(
                    rows["fusion"], lr, nom, psf_j, factor, refine,
                    refine_step)
        sl = slice(shave, -shave)
        out = {}
        for name, img in rows.items():
            mse = jnp.mean((img[sl, sl] - hr_true[sl, sl]) ** 2)
            out[f"psnr_{name}"] = 10.0 * jnp.log10(255.0 ** 2 / mse)
            out[f"ssim_{name}"] = ssim_fn(img[sl, sl], hr_true[sl, sl])
        return out

    sums: dict = {}
    for scene in scenes:
        hr_true = jnp.asarray(np.asarray(scene, np.float32))
        if hr_true.ndim == 3:
            hr_true = hr_true.mean(-1)
        h, w = hr_true.shape
        hr_true = hr_true[: h - h % factor, : w - w % factor]
        key, sub = jax.random.split(key)
        scene_out = jax.device_get(eval_scene(params, hr_true, sub))
        for name, v in scene_out.items():
            sums.setdefault(name, []).append(float(v))
    out = {k: float(np.mean(v)) for k, v in sums.items()}
    out.update(noise_sigma=noise_sigma, jitter_sigma=jitter_sigma,
               n_scenes=len(scenes))
    return out


def _tile_pool(images, tile: int):
    """Cut HWC images into non-overlapping ``tile`` x ``tile`` patches —
    turns a handful of large in-domain images (e.g. a session's own HR
    reconstructions) into a uniform training pool (ZSSR-style internal
    learning)."""
    tiles = []
    for img in images:
        h, w = img.shape[:2]
        for y in range(0, h - tile + 1, tile):
            for x in range(0, w - tile + 1, tile):
                tiles.append(np.ascontiguousarray(
                    img[y:y + tile, x:x + tile]))
    if not tiles:
        raise ValueError(f"no {tile}x{tile} tiles fit the given images")
    return tiles


def train_burst(steps: int = 20000, batch: int = 16, lr_patch: int = 24,
                frames: int = 4, factor: int = 2, n_feats: int = 48,
                n_resblocks: int = 6, noise: float = 2.0,
                jitter: float = 0.05, learning_rate: float = 1e-4,
                loss: str = "l1", out_dir: str = "/tmp/burst_run",
                pool_kind: str = "synthetic", pool_images: int = 64,
                seed: int = 0, eval_every: int = 2000,
                ckpt_every: int = 1000, resume: bool = True,
                margin_lr: int = 6, data_dir: Optional[str] = None,
                tile: int = 128, arch: str = "hr") -> dict:
    """Train BurstFusion on simulated bursts; returns final eval metrics.

    ``arch='lr'`` trains the TPU-first :class:`~..models.zoo.BurstFusionLR`
    variant (polyphase registration, trunk on the LR grid — ~4x cheaper
    per pixel at serving; see the class docstring); ``'hr'`` is the
    round-3 HR-grid :class:`~..models.zoo.BurstFusion`.

    ``data_dir`` switches the scene pool from procedural scenes to tiles
    cut from real images in that directory — the field-adaptation recipe:
    point it at a session's own HR reconstructions (e.g. its SAA_IBP
    outputs) to adapt the net to the deployed scene/sensor statistics,
    then re-run ``sr.run --fusion-run`` on the session.
    """
    import orbax.checkpoint as ocp

    from ..models import create_model
    from .data import POOL_KINDS
    from .loop import _rss_mb
    from .state import TrainConfig, TrainState, make_optimizer, make_train_step
    from ..sr.classical import make_gaussian_psf

    if frames != len(NOMINAL_SHIFTS_4):
        raise ValueError("v1 supports the 4-corner pattern; got "
                         f"frames={frames}")
    os.makedirs(out_dir, exist_ok=True)
    if data_dir:
        from .data import image_pool_from_dir

        tile = max(tile, (lr_patch + 2 * margin_lr) * factor)
        pool = _tile_pool(image_pool_from_dir(data_dir, channels=1), tile)
        np.random.default_rng(seed).shuffle(pool)
        pool = pool[:pool_images]
        if len(pool) < 3:
            raise ValueError(
                f"{data_dir} yields only {len(pool)} {tile}x{tile} tile(s) "
                f"(pool_images={pool_images}); need >= 3 so an eval split "
                "leaves training scenes — use more/larger images or a "
                "smaller --tile")
    else:
        size = max(lr_patch * factor + 32, 192)
        pool = POOL_KINDS[pool_kind](n_images=pool_images, channels=1,
                                     seed=seed, size=size)
    n_eval = max(2, len(pool) // 8)
    eval_pool, train_pool = pool[:n_eval], pool[n_eval:]
    pool_arr = jnp.asarray(np.stack([p[..., 0] for p in train_pool]))

    model_name = ARCHS[arch]
    psf = make_gaussian_psf()
    gen = make_burst_gen(NOMINAL_SHIFTS_4, factor, psf, noise, jitter,
                         margin_lr=margin_lr, model_name=model_name)
    hp = (lr_patch + 2 * margin_lr) * factor  # padded HR patch side

    if model_name == "burstfusion_lr":
        model = create_model(model_name, n_frames=frames, factor=factor,
                             n_feats=n_feats, n_resblocks=n_resblocks)
        init_in = jnp.zeros((1, lr_patch, lr_patch, frames * factor ** 2),
                            jnp.float32)
    else:
        model = create_model(model_name, n_frames=frames, n_feats=n_feats,
                             n_resblocks=n_resblocks)
        hw = lr_patch * factor
        init_in = jnp.zeros((1, hw, hw, frames), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), init_in)
    cfg = TrainConfig(learning_rate=learning_rate, loss=loss,
                      lr_halve_every=max(steps // 2, 1))
    tx = make_optimizer(cfg)
    state = TrainState.create(params, tx)
    step_fn = make_train_step(model.apply, tx, cfg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fused_step(st, pool_dev, key):
        kc, kg = jax.random.split(key)
        hr = _crop_hr_batch(pool_dev, kc, hp, batch)
        stack, tgt = gen(hr, kg)
        return step_fn(st, stack, tgt)

    ckpt_dir = os.path.abspath(os.path.join(out_dir, "ckpt"))
    mngr = ocp.CheckpointManager(
        ocp.test_utils.erase_and_create_empty(ckpt_dir)
        if not (resume and os.path.isdir(ckpt_dir)) else ckpt_dir,
        options=ocp.CheckpointManagerOptions(max_to_keep=2))
    start_step = 0
    latest = mngr.latest_step()
    if resume and latest is not None:
        state = mngr.restore(latest, args=ocp.args.StandardRestore(state))
        start_step = int(latest)
        print(f"resumed from step {start_step}")

    run_cfg = dict(model=model_name, frames=frames, factor=factor,
                   n_feats=n_feats, n_resblocks=n_resblocks, noise=noise,
                   jitter=jitter, lr_patch=lr_patch, batch=batch,
                   steps=steps, pool=pool_kind, pool_images=pool_images,
                   data_dir=data_dir, tile=(tile if data_dir else None),
                   loss=loss, learning_rate=learning_rate, seed=seed)
    with open(os.path.join(out_dir, "config.json"), "w") as fp:
        json.dump(run_cfg, fp, indent=2)

    key = jax.random.PRNGKey(seed + 17)
    key = jax.random.fold_in(key, start_step)
    log_every = 50
    t0 = time.time()
    with open(os.path.join(out_dir, "metrics.jsonl"), "a") as mfp:
        for it in range(start_step + 1, steps + 1):
            key, sub = jax.random.split(key)
            state, metrics = fused_step(state, pool_arr, sub)
            if it % log_every == 0 or it == 1 or it == steps:
                rec = {k: float(v) for k, v in metrics.items()}
                rec.update(step=it, wall_s=round(time.time() - t0, 1),
                           rss_mb=_rss_mb())
                mfp.write(json.dumps(rec) + "\n")
                mfp.flush()
                print(f"step {it}/{steps} " +
                      " ".join(f"{k}={v:.4g}" for k, v in rec.items()
                               if k != "step"))
            if it % ckpt_every == 0 or it == steps:
                mngr.save(it, args=ocp.args.StandardSave(state))
            if it % eval_every == 0 or it == steps:
                ev = evaluate_burst(model.apply, state.ema_params,
                                    eval_pool, factor=factor, psf=psf,
                                    noise_sigma=noise, jitter_sigma=jitter,
                                    classical=(it == steps),
                                    register=REGISTER_FNS[model_name])
                ev["step"] = it
                print("  eval: " + " ".join(
                    f"{k}={v:.3f}" for k, v in ev.items()
                    if k.startswith("psnr")))
                with open(os.path.join(out_dir, "eval.jsonl"), "a") as efp:
                    efp.write(json.dumps(ev) + "\n")
    mngr.wait_until_finished()

    final = evaluate_burst(model.apply, state.ema_params, eval_pool,
                           factor=factor, psf=psf, noise_sigma=noise,
                           jitter_sigma=jitter,
                           register=REGISTER_FNS[model_name])
    final["steps"] = steps
    with open(os.path.join(out_dir, "final_eval.json"), "w") as fp:
        json.dump(final, fp, indent=2)
    return final


def load_burst_run(run_dir: str, dtype=None):
    """Restore a trained burst run -> (apply_fn, ema_params, config).

    Platform-portable (chip-trained runs load on CPU and vice versa):
    weights restore as numpy via :func:`~.state.restore_checkpoint_numpy`.

    ``dtype`` overrides the trunk's COMPUTE dtype at serving time (params
    stay f32; flax casts per layer): ``jnp.bfloat16`` runs the convs at
    the MXU's native bf16 rate — ~2x f32 (PERF_NOTES round-2 conv A/B)
    with held-out PSNR/SSIM unchanged to <0.01 dB because the trunk only
    predicts a residual over the f32 SAA base
    (``models.zoo.BurstFusion``), so bf16 rounding scales with the
    residual, not the signal.
    """
    from ..models import create_model
    from .state import restore_checkpoint_numpy

    with open(os.path.join(run_dir, "config.json")) as fp:
        cfg = json.load(fp)
    kw = {} if dtype is None else {"dtype": dtype}
    name = cfg.get("model", "burstfusion")
    if name == "burstfusion_lr":
        kw["factor"] = cfg["factor"]
    model = create_model(name, n_frames=cfg["frames"],
                         n_feats=cfg["n_feats"],
                         n_resblocks=cfg["n_resblocks"], **kw)
    tree, _ = restore_checkpoint_numpy(os.path.join(run_dir, "ckpt"))
    ema = jax.tree.map(jnp.asarray, tree["ema_params"])
    return model.apply, ema, cfg


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--lr-patch", type=int, default=24)
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--factor", type=int, default=2)
    p.add_argument("--arch", default="hr", choices=sorted(ARCHS),
                   help="hr = round-3 BurstFusion (trunk on the registered "
                        "HR grid); lr = BurstFusionLR (polyphase "
                        "registration, trunk on the LR grid — ~4x cheaper "
                        "serving; defaults --n-feats/--n-resblocks to "
                        "64/8, spending part of the saving on capacity)")
    p.add_argument("--n-feats", type=int, default=None,
                   help="trunk width (default 48 for --arch hr, 64 for lr)")
    p.add_argument("--n-resblocks", type=int, default=None,
                   help="trunk depth (default 6 for --arch hr, 8 for lr)")
    p.add_argument("--noise", type=float, default=2.0,
                   help="sensor read-noise sigma (8-bit counts)")
    p.add_argument("--jitter", type=float, default=0.05,
                   help="shift-calibration error sigma (LR px; the rig "
                        "measures 0.004-0.07, SURVEY.md §6)")
    p.add_argument("--learning-rate", type=float, default=1e-4)
    p.add_argument("--loss", default="l1",
                   choices=["l1", "l2", "charbonnier"])
    p.add_argument("--out", default="/tmp/burst_run")
    p.add_argument("--pool", default=None,
                   choices=["synthetic", "natural", "edges"],
                   help="scene pool (training default: synthetic; "
                        "--eval-only default: the run's recorded pool)")
    p.add_argument("--pool-images", type=int, default=None,
                   help="pool size (training default 64; --eval-only "
                        "default: the run's recorded value — needed to "
                        "reconstruct the held-out split exactly)")
    p.add_argument("--data-dir", default=None,
                   help="train on tiles cut from real images in this dir "
                        "instead of a procedural pool (field adaptation: "
                        "point at a session's HR reconstructions, then "
                        "re-run sr.run --fusion-run)")
    p.add_argument("--tile", type=int, default=None,
                   help="tile side for --data-dir pools (raised to the "
                        "training crop size if smaller; training default "
                        "128, --eval-only default: the run's recorded "
                        "tile)")
    p.add_argument("--seed", type=int, default=None,
                   help="(training default 0; --eval-only default: the "
                        "run's recorded seed — the split depends on it)")
    p.add_argument("--eval-every", type=int, default=2000)
    p.add_argument("--ckpt-every", type=int, default=1000)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--eval-only", action="store_true",
                   help="skip training: evaluate the run in --out against "
                        "bicubic/SAA/IBP at --noise/--jitter")
    p.add_argument("--eval-iters", type=int, default=80,
                   help="IBP iterations in the classical comparison")
    p.add_argument("--refine", type=int, default=0,
                   help="with --eval-only: also score the fusion output "
                        "after N data-consistency Landweber iterations "
                        "(the sr.run --fusion-refine engine)")
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        jax.config.update("jax_platforms", args.platform)

    if args.eval_only:
        from .data import POOL_KINDS, image_pool_from_dir

        apply_fn, ema, cfg = load_burst_run(args.out)
        # score the run on ITS OWN held-out split: every pool-shaping
        # knob (data_dir/tile/pool/pool_images/seed) defaults to the
        # run's recorded config — the train/eval split depends on all of
        # them (cf. scratch/probe_burst_robustness.py); explicit flags
        # still override for cross-distribution scoring
        data_dir = args.data_dir or cfg.get("data_dir")
        pool_images = (args.pool_images if args.pool_images is not None
                       else int(cfg.get("pool_images", 64)))
        seed = (args.seed if args.seed is not None
                else int(cfg.get("seed", 0)))
        if data_dir:
            tile = (args.tile if args.tile is not None
                    else int(cfg.get("tile") or 128))
            pool = _tile_pool(image_pool_from_dir(data_dir, channels=1),
                              tile)
            np.random.default_rng(seed).shuffle(pool)
            pool = pool[:pool_images]
        else:
            pool_kind = args.pool or cfg.get("pool", "synthetic")
            size = max(int(cfg.get("lr_patch", 24))
                       * int(cfg.get("factor", 2)) + 32, 192)
            pool = POOL_KINDS[pool_kind](n_images=pool_images,
                                         channels=1, seed=seed,
                                         size=size)
        n_eval = max(2, len(pool) // 8)
        out = evaluate_burst(apply_fn, ema, pool[:n_eval],
                             factor=cfg["factor"], noise_sigma=args.noise,
                             jitter_sigma=args.jitter,
                             n_iter=args.eval_iters, refine=args.refine,
                             register=REGISTER_FNS[
                                 cfg.get("model", "burstfusion")])
        print(json.dumps(out))
        return 0

    n_feats = args.n_feats if args.n_feats is not None else (
        64 if args.arch == "lr" else 48)
    n_resblocks = args.n_resblocks if args.n_resblocks is not None else (
        8 if args.arch == "lr" else 6)
    final = train_burst(steps=args.steps, batch=args.batch,
                        lr_patch=args.lr_patch, frames=args.frames,
                        factor=args.factor, n_feats=n_feats,
                        n_resblocks=n_resblocks, noise=args.noise,
                        jitter=args.jitter,
                        learning_rate=args.learning_rate, loss=args.loss,
                        out_dir=args.out,
                        pool_kind=args.pool or "synthetic",
                        pool_images=(64 if args.pool_images is None
                                     else args.pool_images),
                        seed=0 if args.seed is None else args.seed,
                        eval_every=args.eval_every,
                        ckpt_every=args.ckpt_every,
                        resume=not args.no_resume,
                        data_dir=args.data_dir,
                        tile=(128 if args.tile is None else args.tile),
                        arch=args.arch)
    print(json.dumps(final))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
