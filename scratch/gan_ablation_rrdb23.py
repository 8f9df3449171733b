"""GAN fine-tune ablation harness: dose-response arms from one pretrain.

One process, ONE compiled step for every arm (GANBalance knobs are runtime
scalars in the state, see train/state.py).  Two campaigns ran on this:

- VERDICT round-2 item 2 (RRDB-23, synthetic pool): demonstrate the
  adversarial term is ALIVE at training scale — d_loss off the floor,
  dose-dependent D-G equilibrium (RESULTS.md; scratch/logs/gan_ablation_r3).
- Round-3 perception-distortion demo (EDSR, --pool natural): on scenes
  with stochastic above-Nyquist texture the L1 pretrain oversmooths
  (grad_ratio ~0.32), and the GAN term recovers texture *statistics*
  (spec_dist down, grad_ratio up) while PSNR falls — the classic ESRGAN
  tradeoff, plus the §3.4 network-interpolation curve (--interp).

Design:
  1. restore the L1 pretrain checkpoint (--pretrain run dir);
  2. PROBE (or --knobs to pin): 400 GAN steps with moderate damping;
     escalate/relax damping based on the probe's d_loss median.  NOTE the
     escalation rule is for the saturating-D regime; when the real/fake
     gap IS the feature to learn (natural pool), pin a live D instead —
     heavy instance noise blinds D to the texture difference;
  3. ARMS from the SAME restored G and the SAME D init, identical knobs,
     differing only in gan_weight (--doses).  Weight scale intuition: the
     reconstruction terms here evaluate ~60 on 0..255 images, so
     paper-equivalent RELATIVE weighting is gan_weight ~0.3-3, not 5e-3;
  4. eval each arm's EMA generator: PSNR / SSIM / grad_ratio / spec_dist,
     per-arm SR sample PNGs, optional pretrain<->arm interpolation sweep.

Usage:
  python scratch/gan_ablation_rrdb23.py --pretrain /tmp/rrdb23_pre \
      --out /tmp/gan_ablation [--steps 2500] [--probe 400]
  python scratch/gan_ablation_rrdb23.py --model edsr --pool natural \
      --pretrain /tmp/edsr_nat_pre --out /tmp/gan_nat --steps 5000 \
      --knobs "d_lr_scale=0.3,d_every=1,instance_noise=2" \
      --doses 0,3,10 --interp
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
    p.add_argument("--interp", action="store_true",
                   help="after the arms, network-interpolation sweep "
                        "(ESRGAN 3.4) pretrain<->best-spec_dist arm: the "
                        "perception-distortion curve")
    p.add_argument("--knobs", default=None,
                   help="skip the probe and pin the balance knobs, e.g. "
                        "'d_lr_scale=0.3,d_every=1,instance_noise=2'. The "
                        "probe's escalation rule (heavier damping when D "
                        "saturates) is wrong when the real/fake gap IS the "
                        "feature to learn: noise that keeps D honest can "
                        "also blind it to the texture difference")
    p.add_argument("--doses", default="0,5e-3,2e-2",
                   help="comma-separated gan_weight arms. The right scale "
                        "depends on the magnitude of the reconstruction "
                        "terms: here percep+L1 evaluate ~60 on 0..255 "
                        "images, so paper-equivalent RELATIVE weighting "
                        "(ESRGAN: 5e-3 GAN vs ~1 percep) is gan_weight "
                        "~0.3, not 5e-3")
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

    final_emas: dict = {}  # tag -> final EMA params (network interpolation)

    def interp_sweep(tag: str):
        """ESRGAN §3.4 network interpolation against the pretrain: the
        perception-distortion CURVE — as α goes 0→1, PSNR falls and
        spec_dist falls (texture statistics recovered)."""
        rows = []
        for alpha in (0.0, 0.2, 0.4, 0.6, 0.8, 1.0):
            blend = jax.tree.map(
                lambda a, b: (1.0 - alpha) * a + alpha * b,
                restored.ema_params, final_emas[tag])
            ev = evaluate_sr(model.apply, blend, eval_pool, scale)
            ev["alpha"] = alpha
            rows.append(ev)
            print(json.dumps({"interp": tag, **ev}), flush=True)
        return rows

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
        final_emas[tag] = jax.tree.map(np.asarray, state.g.ema_params)
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

    if args.knobs:
        knobs = {}
        for kv in args.knobs.split(","):
            k, v = kv.split("=")
            knobs[k.strip()] = (int(v) if k.strip() == "d_every"
                                else float(v))
        print(f"knob choice: {knobs} (pinned via --knobs)", flush=True)
        results["probe_decision"] = {"pinned": True, **knobs}
        doses = [float(x) for x in args.doses.split(",")]
        for w in doses:
            tag = "gw0" if w == 0 else f"gw{w:g}".replace(".", "p")
            _, ev = run(tag, GANBalance.create(gan_weight=w, **knobs),
                        args.steps)
            results[tag] = ev

        if args.interp:
            best = min((t for t in results if t.startswith("gw")),
                       key=lambda t: results[t]["spec_dist"])
            results["interp"] = {"arm": best, "rows": interp_sweep(best)}
        with open(os.path.join(args.out, "summary.json"), "w") as fp:
            json.dump(results, fp, indent=2)
        print("ABLATION DONE", flush=True)
        return 0

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
    doses = [float(x) for x in args.doses.split(",")]
    for w in doses:
        tag = "gw0" if w == 0 else f"gw{w:g}".replace(".", "p")
        _, ev = run(tag, GANBalance.create(gan_weight=w, **knobs),
                    args.steps)
        results[tag] = ev


    if args.interp:
        best = min((t for t in results if t.startswith("gw")),
                   key=lambda t: results[t]["spec_dist"])
        results["interp"] = {"arm": best, "rows": interp_sweep(best)}
    with open(os.path.join(args.out, "summary.json"), "w") as fp:
        json.dump(results, fp, indent=2)
    print("ABLATION DONE", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
