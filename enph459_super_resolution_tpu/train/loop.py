"""Training driver: jitted/sharded steps, periodic eval, checkpoint/resume.

CLI:
  python -m enph459_super_resolution_tpu.train.loop --model edsr --scale 4 \
      --steps 2000 --out /tmp/run [--data-dir DIV2K_train_HR] [--gan]

Covers the BASELINE.json training configs (SRCNN / ESPCN / FSRCNN / EDSR /
ESRGAN fine-tune).  Observability (SURVEY.md §5 rebuild): metrics stream to
``metrics.jsonl``; checkpoints via orbax with resume; EMA weights evaluated.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp


def _rss_mb() -> int:
    """Host resident-set size in MB (observability: long runs on the
    tunneled backend have been OOM-killed by host-side transfer-buffer
    growth — ~7.4 MB/step at batch 16, measured; logging it in
    metrics.jsonl makes the growth visible and restart thresholds
    tunable)."""
    try:
        with open("/proc/self/status") as fp:
            for line in fp:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) // 1024
    except OSError:
        pass
    return -1


def train(model_name: str = "edsr", scale: int = 4, steps: int = 1000,
          batch: int = 16, lr_patch: int = 48, learning_rate: float = 1e-4,
          loss: str = "l1", out_dir: str = "/tmp/sr_train",
          data_dir: Optional[str] = None, eval_every: int = 500,
          ckpt_every: int = 500, channels: int = 3, dp: bool = True,
          gan: bool = False, seed: int = 0, resume: bool = True,
          model_kwargs: Optional[dict] = None,
          pool_images: int = 32, pool_kind: str = "synthetic",
          vgg_weights: Optional[str] = None,
          init_from: Optional[str] = None,
          steps_per_dispatch: int = 1,
          gan_weight: float = 5e-3,
          d_lr_scale: float = 1.0,
          d_every: int = 1,
          instance_noise: float = 0.0,
          mesh_spec: Optional[str] = None) -> dict:
    """Train a zoo model; returns the final eval metrics.

    ``mesh_spec`` (e.g. ``"dp=2,tp=2"``, ``"dp=2,sp=2,tp=2"`` or
    ``"dp=2,pp=4"``) trains over an explicit device mesh: batch sharded
    over dp (and patch rows over sp when given), params TP-sharded over tp
    via :func:`~..parallel.shard_params_tp`; ``pp`` (EDSR only) switches
    the model to the stacked scan-trunk layout and trains through the
    GPipe pipeline (:func:`~..parallel.pipeline.make_pipelined_edsr_apply`;
    batch must divide by the pp-depth microbatching); ``ep`` (edsr_moe
    only) shards the gated-expert stacks over the mesh
    (:func:`~..parallel.moe.shard_params_ep_named` — E/ep expert branches
    per device, one psum combine).  Default (None): dp over all devices
    when more than one is visible.
    """
    from ..models import VGGStyleDiscriminator, create_model
    from ..parallel import (make_mesh, parse_mesh_spec, shard_params_tp,
                            shard_train_step)
    from ..parallel.pipeline import (make_pipelined_edsr_apply,
                                     shard_edsr_pp_params)
    from .data import (POOL_KINDS, PatchConfig, evaluate_sr,
                       image_pool_from_dir, make_patch_sampler)
    from .state import (GANBalance, GANTrainState, TrainConfig, TrainState,
                        make_gan_train_step, make_optimizer, make_train_step)

    os.makedirs(out_dir, exist_ok=True)

    # device mesh: explicit spec > implicit all-device dp > single device
    # (parsed before model creation: a pp axis changes the model's trunk
    # param layout)
    mesh = None
    mesh_axes: dict = {}
    if mesh_spec:
        mesh_axes = parse_mesh_spec(mesh_spec)
        n_mesh = 1
        for v in mesh_axes.values():
            n_mesh *= v
        mesh = make_mesh(mesh_axes, devices=jax.devices()[:n_mesh])
    elif dp and len(jax.devices()) > 1:
        mesh_axes = {"dp": len(jax.devices())}
        mesh = make_mesh(mesh_axes)
    tp_on = mesh is not None and mesh_axes.get("tp", 1) > 1
    pp_on = mesh is not None and mesh_axes.get("pp", 1) > 1
    if pp_on and model_name != "edsr":
        raise ValueError("pipeline parallelism (pp mesh axis) is wired for "
                         "--model edsr (scan-trunk layout)")
    if pp_on and gan:
        raise ValueError("pp + --gan is not supported (pipeline the "
                         "pretrain, fine-tune on dp/tp)")
    if pp_on and tp_on:
        raise ValueError("pp + tp in one mesh is not supported (the pp "
                         "param placement would override the tp layout); "
                         "combine pp with dp")
    ep_on = mesh is not None and mesh_axes.get("ep", 1) > 1
    if ep_on and model_name != "edsr_moe":
        raise ValueError("expert parallelism (ep mesh axis) is wired for "
                         "--model edsr_moe (gated-expert trunk); use "
                         "dp/sp/tp/pp for dense models")
    if ep_on and (tp_on or pp_on):
        raise ValueError("ep composes with dp/sp only (a tp/pp param "
                         "placement would override the expert layout)")

    kwargs = dict(model_kwargs or {})
    if ep_on:
        n_experts = int(kwargs.get("n_experts", 4))
        if n_experts % mesh_axes["ep"] != 0:
            raise ValueError(f"n_experts={n_experts} not divisible by "
                             f"ep={mesh_axes['ep']}")
    if pp_on:
        kwargs.setdefault("scan_trunk", True)
    if model_name == "srcnn":
        kwargs.setdefault("channels", channels)
        model = create_model(model_name, **kwargs)
    else:
        model = create_model(model_name, scale=scale, channels=channels,
                             **kwargs)

    make_pool = POOL_KINDS[pool_kind]
    pool = (image_pool_from_dir(data_dir, channels=channels) if data_dir
            else make_pool(n_images=pool_images,
                           channels=channels, seed=seed,
                           size=max(lr_patch * scale + 16, 192)))
    n_eval = max(2, len(pool) // 8)
    eval_pool, train_pool = pool[:n_eval], pool[n_eval:]
    sampler = make_patch_sampler(train_pool,
                                 PatchConfig(scale=scale, lr_patch=lr_patch,
                                             batch=batch), seed=seed)

    lr0, hr0 = next(sampler)
    if model_name == "srcnn":
        # SRCNN operates on the pre-upsampled grid
        from ..ops.resize import bicubic_upsample
        def apply_fn(params, lr):
            return model.apply(params, bicubic_upsample(lr, scale))
        init_in = jnp.zeros_like(hr0[:1])
    else:
        apply_fn = model.apply
        init_in = lr0[:1]
    params = model.init(jax.random.PRNGKey(seed), init_in)

    # train-time forward: the pipelined apply when a pp axis is present
    # (eval keeps model.apply — same stacked params, sequential trunk)
    train_apply = apply_fn
    if pp_on:
        train_apply = make_pipelined_edsr_apply(
            model, mesh, dp_axis="dp" if mesh_axes.get("dp", 1) > 1 else None)

    def maybe_tp(p):
        if tp_on:
            p = shard_params_tp(p, mesh, "tp")
        if pp_on:
            p = shard_edsr_pp_params(p, mesh)
        if ep_on:
            from ..parallel.moe import shard_params_ep_named
            p = shard_params_ep_named(p, mesh, "ep")
        return p

    params = maybe_tp(params)

    cfg = TrainConfig(learning_rate=learning_rate, loss=loss,
                      lr_halve_every=max(steps // 2, 1))
    tx = make_optimizer(cfg)

    ckpt_dir = os.path.abspath(os.path.join(out_dir, "ckpt"))  # orbax
    # rejects relative checkpoint paths at save time
    import orbax.checkpoint as ocp
    mngr = ocp.CheckpointManager(
        ocp.test_utils.erase_and_create_empty(ckpt_dir)
        if not (resume and os.path.isdir(ckpt_dir)) else ckpt_dir,
        options=ocp.CheckpointManagerOptions(max_to_keep=2))

    init_ema = None
    if init_from:
        # Warm-start from another run's latest checkpoint (the ESRGAN recipe:
        # PSNR-oriented L1 pretrain, then perceptual/GAN fine-tune from it
        # with a fresh optimizer).  Same model/optimizer config as the source
        # run is the caller's contract (StandardRestore needs the pytrees to
        # match).
        src = ocp.CheckpointManager(
            os.path.abspath(os.path.join(init_from, "ckpt")))
        if src.latest_step() is None:
            raise FileNotFoundError(f"no checkpoint under {init_from}/ckpt")
        restored = src.restore(src.latest_step(),
                               args=ocp.args.StandardRestore(
                                   TrainState.create(params, tx)))
        params = maybe_tp(restored.params)
        init_ema = maybe_tp(restored.ema_params)
        print(f"initialized generator from {init_from} "
              f"step {src.latest_step()}")

    if gan:
        disc = VGGStyleDiscriminator(nf=32)
        d_params = maybe_tp(disc.init(jax.random.PRNGKey(seed + 1), hr0[:1]))
        # D's effective lr = learning_rate × balance.d_lr_scale, applied as
        # a runtime update-scale inside the step (Adam-equivalent) so
        # retuning it never recompiles.
        d_tx = make_optimizer(cfg)
        from .losses import PerceptualLoss
        feat_fn = None  # default: weight-free gradient features
        if vgg_weights:
            # paper-exact ESRGAN perceptual term (pre-activation conv5_4)
            from .vgg import load_torch_vgg19, make_vgg_feature_fn
            feat_fn = make_vgg_feature_fn(load_torch_vgg19(vgg_weights))
        g0 = TrainState.create(params, tx)
        if init_ema is not None:
            g0 = g0.replace(ema_params=init_ema)
        balance = GANBalance.create(gan_weight=gan_weight,
                                    d_lr_scale=d_lr_scale, d_every=d_every,
                                    instance_noise=instance_noise)
        state = GANTrainState(step=jnp.zeros((), jnp.int32), g=g0,
                              d_params=d_params,
                              d_opt_state=d_tx.init(d_params),
                              balance=balance)
        step_fn = make_gan_train_step(apply_fn, disc.apply, tx, d_tx, cfg,
                                      percep_loss=PerceptualLoss(feat_fn),
                                      noise_seed=seed + 2)
    else:
        state = TrainState.create(params, tx)
        if init_ema is not None:
            state = state.replace(ema_params=init_ema)
        step_fn = make_train_step(train_apply, tx, cfg)

    start_step = 0
    latest = mngr.latest_step()
    if resume and latest is not None:
        state = mngr.restore(latest, args=ocp.args.StandardRestore(state))
        start_step = int(latest)
        if gan:
            # balance knobs follow the CLI, not the checkpoint: a resumed
            # run may be resumed precisely to retune them
            state = state.replace(balance=balance)
        print(f"resumed from step {start_step}")

    if mesh is not None:
        step = shard_train_step(step_fn, mesh,
                                sp_axis="sp" if "sp" in mesh_axes else None)
        steps_per_dispatch = 1  # sharded path stays one step per dispatch
    else:
        step = jax.jit(step_fn, donate_argnums=(0,))

    if steps_per_dispatch > 1:
        # Roll k optimizer steps into ONE dispatch (lax.scan over k
        # pre-sampled batches).  Trajectory-equivalent to k sequential
        # steps (tested).  Measured on the tunneled chip it does NOT pay
        # (k=10 was 0.61x: async dispatch already pipelines the per-step
        # RTT, while host-side k-batch assembly and the one large upload
        # add real cost) — it exists for backends where dispatch blocks
        # or host Python per-step overhead dominates.
        k = steps_per_dispatch

        @functools.partial(jax.jit, donate_argnums=(0,))
        def multi_step(state, lr_k, hr_k):
            def body(st, xy):
                st, m = step_fn(st, *xy)
                return st, m
            state, ms = jax.lax.scan(body, state, (lr_k, hr_k))
            return state, jax.tree.map(lambda x: x[-1], ms)  # last metrics

    LOG_EVERY = 50  # metrics.jsonl cadence; chunk_size aligns to it

    def chunk_size(done: int) -> int:
        """Steps to run in the next dispatch: the full k unless a log/
        checkpoint/eval boundary (or the end) lands inside it — boundaries
        must be hit exactly so cadence semantics match k=1."""
        k = steps_per_dispatch
        nxt = min(((done // m) + 1) * m
                  for m in (LOG_EVERY, ckpt_every, eval_every))
        return max(1, min(k, steps - done, nxt - done))

    # run provenance: evaluate/--init-from consumers need the ACTUAL model
    # kwargs (e.g. the scan_trunk=True a pp mesh injects), not just what
    # the user typed
    with open(os.path.join(out_dir, "config.json"), "w") as fp:
        json.dump(dict(model=model_name, scale=scale, channels=channels,
                       model_kwargs=kwargs, steps=steps, batch=batch,
                       lr_patch=lr_patch, learning_rate=learning_rate,
                       loss=loss, pool=pool_kind, pool_images=pool_images,
                       data_dir=data_dir, seed=seed, mesh=mesh_spec,
                       gan=gan), fp, indent=2)

    metrics_path = os.path.join(out_dir, "metrics.jsonl")
    t0 = time.time()
    with open(metrics_path, "a") as mfp:
        it = start_step
        first = True
        while it < steps:
            k_eff = chunk_size(it)
            if k_eff == steps_per_dispatch and k_eff > 1:
                batches = [next(sampler) for _ in range(k_eff)]
                state, metrics = multi_step(
                    state, jnp.stack([b[0] for b in batches]),
                    jnp.stack([b[1] for b in batches]))
            else:
                for _ in range(k_eff - 1):  # odd remainder before a boundary
                    lr_b, hr_b = next(sampler)
                    state, _ = step(state, lr_b, hr_b)
                lr_b, hr_b = next(sampler)
                state, metrics = step(state, lr_b, hr_b)
            it += k_eff
            if it % LOG_EVERY == 0 or first or it == steps:
                first = False
                rec = {k: float(v) for k, v in metrics.items()}
                rec.update(step=it, wall_s=round(time.time() - t0, 1),
                           rss_mb=_rss_mb())
                mfp.write(json.dumps(rec) + "\n")
                mfp.flush()
                print(f"step {it}/{steps} " +
                      " ".join(f"{k}={v:.4g}" for k, v in rec.items()
                               if k not in ("step",)))
            if it % ckpt_every == 0 or it == steps:
                mngr.save(it, args=ocp.args.StandardSave(state))
            if it % eval_every == 0 or it == steps:
                g = state.g if gan else state
                ev = evaluate_sr(apply_fn, g.ema_params, eval_pool, scale)
                ev["step"] = it
                print(f"  eval: psnr={ev['psnr']:.3f} ssim={ev['ssim']:.4f} "
                      f"(bicubic {ev['bicubic_psnr']:.3f})")
                with open(os.path.join(out_dir, "eval.jsonl"), "a") as efp:
                    efp.write(json.dumps(ev) + "\n")
    mngr.wait_until_finished()

    g = state.g if gan else state
    final = evaluate_sr(apply_fn, g.ema_params, eval_pool, scale)
    final["steps"] = steps
    with open(os.path.join(out_dir, "final_eval.json"), "w") as fp:
        json.dump(final, fp, indent=2)
    return final


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="edsr",
                   choices=["srcnn", "espcn", "fsrcnn", "edsr", "edsr_moe",
                            "rrdbnet"])
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--lr-patch", type=int, default=48)
    p.add_argument("--learning-rate", type=float, default=1e-4)
    p.add_argument("--loss", default="l1",
                   choices=["l1", "l2", "charbonnier"])
    p.add_argument("--out", default="/tmp/sr_train")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--channels", type=int, default=3)
    p.add_argument("--gan", action="store_true",
                   help="ESRGAN-style adversarial fine-tune")
    p.add_argument("--gan-weight", type=float, default=5e-3,
                   help="λ on the RaGAN generator term; 0 = perceptual-only "
                        "ablation (the D still trains but contributes no "
                        "gradient to G)")
    p.add_argument("--d-lr-scale", type=float, default=1.0,
                   help="discriminator learning rate = --learning-rate × "
                        "this (lower it when d_loss saturates to ~0)")
    p.add_argument("--d-every", type=int, default=1,
                   help="update the discriminator only every N steps")
    p.add_argument("--instance-noise", type=float, default=0.0,
                   help="σ (pixel counts, 0..255 scale) of Gaussian noise on "
                        "D inputs — keeps D from separating real/fake "
                        "perfectly")
    p.add_argument("--vgg-weights", default=None,
                   help="torchvision vgg19 .pth: use the paper-exact "
                        "pre-activation conv5_4 perceptual loss (default: "
                        "weight-free gradient features)")
    p.add_argument("--pool-images", type=int, default=32,
                   help="synthetic-pool size when no --data-dir is given "
                        "(small pools overfit past ~20k steps)")
    p.add_argument("--pool", default="synthetic",
                   choices=["synthetic", "natural", "edges"],
                   help="procedural pool when no --data-dir is given: "
                        "'synthetic' (learnable edges/boxes/bars), "
                        "'natural' (1/f spectra + stochastic fine texture "
                        "above the LR Nyquist — exposes the perception-"
                        "distortion tradeoff; see natural_scene_pool), or "
                        "'edges' (piecewise-smooth Set5-like scenes where "
                        "x4 edge reconstruction dominates)")
    p.add_argument("--model-kwargs", default=None,
                   help='JSON dict of extra model constructor kwargs, e.g. '
                        '\'{"nb": 8}\' for a smaller RRDBNet or '
                        '\'{"n_resblocks": 8, "n_feats": 32}\' for '
                        'EDSR-small')
    p.add_argument("--init-from", default=None,
                   help="warm-start the (generator) params/EMA from another "
                        "run dir's latest checkpoint (ESRGAN recipe: L1 "
                        "pretrain, then --gan fine-tune --init-from it)")
    p.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="roll k optimizer steps into one device dispatch "
                        "(lax.scan): amortizes per-dispatch RTT on remote/"
                        "tunneled backends; use a divisor of the log/ckpt/"
                        "eval cadences (e.g. 10, 25, 50)")
    p.add_argument("--mesh", default=None, metavar="SPEC",
                   help='explicit device mesh, e.g. "dp=2,tp=2", '
                        '"dp=2,sp=2,tp=2", "dp=2,pp=4" or "dp=2,ep=4": '
                        'batch over dp, patch rows over sp, conv feature '
                        'dims over tp, EDSR trunk stages pipelined over '
                        'pp, edsr_moe experts sharded over ep (default: '
                        'dp over all visible devices)')
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax as _jax
        _jax.config.update("jax_platforms", args.platform)
    # Persist compiled executables across training invocations (same setup
    # as sr.run; the env var is snapshotted at jax import so go through
    # jax.config).  No-op on the axon backend, which compiles server-side.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       f"/tmp/jax_cache_srtpu_{os.getuid()}"))

    final = train(model_name=args.model, scale=args.scale, steps=args.steps,
                  batch=args.batch, lr_patch=args.lr_patch,
                  learning_rate=args.learning_rate, loss=args.loss,
                  out_dir=args.out, data_dir=args.data_dir,
                  channels=args.channels, gan=args.gan,
                  resume=not args.no_resume, pool_images=args.pool_images,
                  pool_kind=args.pool,
                  vgg_weights=args.vgg_weights, init_from=args.init_from,
                  model_kwargs=(json.loads(args.model_kwargs)
                                if args.model_kwargs else None),
                  steps_per_dispatch=args.steps_per_dispatch,
                  gan_weight=args.gan_weight, d_lr_scale=args.d_lr_scale,
                  d_every=args.d_every, instance_noise=args.instance_noise,
                  mesh_spec=args.mesh)
    print(json.dumps(final))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
