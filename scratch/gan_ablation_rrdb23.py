"""GAN-on/off ablation at paper scale (RRDB-23), one process, ONE compile.

VERDICT round-2 item 2: demonstrate the adversarial term is ALIVE at
training scale — d_loss off the floor, outputs measurably sharper than the
perceptual-only ablation.  The round-2 fine-tune saturated its
discriminator (d_loss -> 1e-5) because D trained at full lr against a
frozen-good generator with disjoint real/fake supports.

Design (all arms share one compiled step — GANBalance knobs are runtime
scalars in the state, see train/state.py):
  1. restore the RRDB-23 L1 pretrain checkpoint (--pretrain run dir);
  2. PROBE: 400 GAN steps with moderate damping; if the D still saturates
     (median d_loss of the last 100 logged steps < 0.05) escalate to
     heavier damping, if D is losing (> 1.2) relax;
  3. ARMS, each 2500 steps from the SAME restored G and the SAME D init,
     chosen knobs fixed: gan_weight 0 (perceptual-only ablation),
     5e-3 (ESRGAN paper), 2e-2 (stronger dose) — a dose-response curve on
     the adversarial weight, everything else identical;
  4. eval each arm's EMA generator: PSNR / SSIM / grad_ratio (sharpness
     index: mean |grad SR| / mean |grad HR|, train/data.py).

Usage:
  python scratch/gan_ablation_rrdb23.py --pretrain /tmp/rrdb23_pre \
      --out /tmp/gan_ablation [--steps 2500] [--probe 400]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--pretrain", default="/tmp/rrdb23_pre")
    p.add_argument("--out", default="/tmp/gan_ablation")
    p.add_argument("--steps", type=int, default=2500)
    p.add_argument("--probe", type=int, default=400)
    p.add_argument("--lr", type=float, default=5e-5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None)
    # smoke-test sizing (CPU): --nb 1 --lr-patch 12 --batch 2 --pool-images 16
    p.add_argument("--nb", type=int, default=23)
    p.add_argument("--model", default="rrdbnet", choices=["rrdbnet", "edsr"])
    p.add_argument("--pool", default="synthetic",
                   choices=["synthetic", "natural"],
                   help="match the pretrain run's --pool (the 'natural' "
                        "pool has stochastic above-Nyquist texture: the "
                        "perception-distortion regime)")
    p.add_argument("--lr-patch", type=int, default=48)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--pool-images", type=int, default=128)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from enph459_super_resolution_tpu.models import (VGGStyleDiscriminator,
                                                     create_model)
    from enph459_super_resolution_tpu.train.data import (PatchConfig,
                                                         evaluate_sr,
                                                         make_patch_sampler,
                                                         natural_scene_pool,
                                                         synthetic_scene_pool)
    from enph459_super_resolution_tpu.train.losses import PerceptualLoss
    from enph459_super_resolution_tpu.train.state import (GANBalance,
                                                          GANTrainState,
                                                          TrainConfig,
                                                          TrainState,
                                                          make_gan_train_step,
                                                          make_optimizer)

    os.makedirs(args.out, exist_ok=True)
    scale, channels = 4, 3
    lr_patch, batch, pool_images = args.lr_patch, args.batch, args.pool_images

    # identical pool/split to the pretrain run (train/loop.py)
    make_pool = (natural_scene_pool if args.pool == "natural"
                 else synthetic_scene_pool)
    pool = make_pool(n_images=pool_images, channels=channels,
                     seed=args.seed,
                     size=max(lr_patch * scale + 16, 192))
    n_eval = max(2, len(pool) // 8)
    eval_pool, train_pool = pool[:n_eval], pool[n_eval:]
    sampler = make_patch_sampler(
        train_pool, PatchConfig(scale=scale, lr_patch=lr_patch, batch=batch),
        seed=args.seed)
    lr0, hr0 = next(sampler)

    mk = {"nb": args.nb} if args.model == "rrdbnet" else {}
    model = create_model(args.model, scale=scale, channels=channels, **mk)
    params0 = model.init(jax.random.PRNGKey(args.seed), lr0[:1])

    cfg = TrainConfig(learning_rate=args.lr,
                      lr_halve_every=max(args.steps // 2, 1))
    tx = make_optimizer(cfg)
    d_tx = make_optimizer(cfg)

    import orbax.checkpoint as ocp
    src = ocp.CheckpointManager(
        os.path.abspath(os.path.join(args.pretrain, "ckpt")))
    step0 = src.latest_step()
    if step0 is None:
        raise FileNotFoundError(f"no checkpoint under {args.pretrain}/ckpt")
    restored = src.restore(step0, args=ocp.args.StandardRestore(
        TrainState.create(params0, tx)))
    print(f"restored pretrain step {step0}", flush=True)

    disc = VGGStyleDiscriminator(nf=32)
    d_params0 = disc.init(jax.random.PRNGKey(args.seed + 1), hr0[:1])

    step_fn = jax.jit(
        make_gan_train_step(model.apply, disc.apply, tx, d_tx, cfg,
                            percep_loss=PerceptualLoss(),
                            noise_seed=args.seed + 2),
        donate_argnums=(0,))

    def fresh_state(balance: GANBalance) -> GANTrainState:
        g0 = TrainState.create(jax.tree.map(jnp.copy, restored.params), tx)
        g0 = g0.replace(ema_params=jax.tree.map(jnp.copy,
                                                restored.ema_params))
        d0 = jax.tree.map(jnp.copy, d_params0)
        return GANTrainState(step=jnp.zeros((), jnp.int32), g=g0,
                             d_params=d0, d_opt_state=d_tx.init(d0),
                             balance=balance)

    def run(tag: str, balance: GANBalance, n_steps: int):
        """n_steps GAN steps from the pretrain point; returns (metrics
        history fetched once, final eval)."""
        # snapshot knob scalars BEFORE stepping: the state (incl. balance)
        # is donated, so these buffers are deleted after the first step
        knob_rec = dict(gan_weight=float(balance.gan_weight),
                        d_lr_scale=float(balance.d_lr_scale),
                        d_every=int(balance.d_every),
                        instance_noise=float(balance.instance_noise))
        state = fresh_state(balance)
        hist_dev, hist_at = [], []
        t0 = time.time()
        for it in range(1, n_steps + 1):
            lr_b, hr_b = next(sampler)
            state, m = step_fn(state, lr_b, hr_b)
            if it % 25 == 0 or it == 1 or it == n_steps:
                hist_dev.append((m["d_loss"], m["g_gan"], m["g_loss"],
                                 m["psnr"]))
                hist_at.append(it)
        stacked = np.asarray(jnp.asarray(hist_dev))  # ONE fetch
        wall = time.time() - t0
        recs = [{"step": s, "d_loss": float(r[0]), "g_gan": float(r[1]),
                 "g_loss": float(r[2]), "psnr": float(r[3])}
                for s, r in zip(hist_at, stacked)]
        with open(os.path.join(args.out, f"{tag}.jsonl"), "w") as fp:
            for r in recs:
                fp.write(json.dumps(r) + "\n")
        ev = evaluate_sr(model.apply, state.g.ema_params, eval_pool, scale)
        ev.update(tag=tag, steps=n_steps, wall_s=round(wall, 1), **knob_rec)
        print(json.dumps(ev), flush=True)
        dump_sample(tag, state.g.ema_params)
        return recs, ev

    def dump_sample(tag: str, ema_params):
        """Visual evidence: SR of the first held-out scene (plus HR and
        bicubic once) so the texture-hallucination difference between arms
        is inspectable, not just a grad_ratio scalar."""
        from enph459_super_resolution_tpu.data.io import save_png
        from enph459_super_resolution_tpu.ops.resize import (bicubic_degrade,
                                                             bicubic_upsample)
        img = eval_pool[0]
        h, w = (img.shape[0] // scale) * scale, (img.shape[1] // scale) * scale
        hr = jnp.asarray(img[:h, :w])
        lr = bicubic_degrade(hr[None], scale)
        sr = np.asarray(jnp.clip(model.apply(ema_params, lr)[0], 0, 255))
        save_png(sr.astype(np.uint8),
                 os.path.join(args.out, f"sample_{tag}.png"))
        hr_path = os.path.join(args.out, "sample_hr.png")
        if not os.path.exists(hr_path):
            save_png(np.asarray(hr).astype(np.uint8), hr_path)
            bic = np.asarray(jnp.clip(bicubic_upsample(lr, scale)[0], 0, 255))
            save_png(bic.astype(np.uint8),
                     os.path.join(args.out, "sample_bicubic.png"))

    results = {}

    # baseline: the pretrain EMA as restored
    ev0 = evaluate_sr(model.apply, restored.ema_params, eval_pool, scale)
    ev0["tag"] = "pretrain"
    print(json.dumps(ev0), flush=True)
    results["pretrain"] = ev0
    dump_sample("pretrain", restored.ema_params)

    # ---- probe: does the moderate-damping D stay off the floor? --------
    probe_bal = GANBalance.create(gan_weight=5e-3, d_lr_scale=0.1,
                                  d_every=1, instance_noise=5.0)
    recs, _ = run("probe", probe_bal, args.probe)
    tail = [r["d_loss"] for r in recs[-4:]]
    med = float(np.median(tail))
    if med < 0.05:
        knobs = dict(d_lr_scale=0.03, d_every=3, instance_noise=10.0)
        why = f"probe d_loss median {med:.4g} < 0.05: escalate damping"
    elif med > 1.2:
        knobs = dict(d_lr_scale=0.3, d_every=1, instance_noise=3.0)
        why = f"probe d_loss median {med:.4g} > 1.2: relax damping"
    else:
        knobs = dict(d_lr_scale=0.1, d_every=1, instance_noise=5.0)
        why = f"probe d_loss median {med:.4g} in band: keep"
    print(f"knob choice: {knobs} ({why})", flush=True)
    results["probe_decision"] = {"median_d_loss": med, **knobs}

    # ---- dose-response arms (same G restore, same D init, same knobs) --
    for tag, w in (("gw0", 0.0), ("gw5e3", 5e-3), ("gw2e2", 2e-2)):
        _, ev = run(tag, GANBalance.create(gan_weight=w, **knobs),
                    args.steps)
        results[tag] = ev

    with open(os.path.join(args.out, "summary.json"), "w") as fp:
        json.dump(results, fp, indent=2)
    print("ABLATION DONE", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
