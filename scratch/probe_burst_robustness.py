"""Robustness sweep for a trained burst-fusion run: PSNR/SSIM of
bicubic / SAA / IBP / fusion [/ fusion+refine] across (jitter, noise)
points, on the run's own held-out split — the RESULTS.md sweep-table
probe (one process, compiles shared across points).

Usage:
  python scratch/probe_burst_robustness.py --run /tmp/r4_burst_lr \
      [--refine 30] [--points default] [--out sweep.jsonl]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

DEFAULT_POINTS = [(0.0, 0.0), (0.0, 2.0), (0.05, 2.0), (0.10, 2.0),
                  (0.15, 2.0), (0.05, 4.0)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run", required=True)
    p.add_argument("--refine", type=int, default=0)
    p.add_argument("--eval-iters", type=int, default=80)
    p.add_argument("--out", default=None, help="JSONL path (default: print)")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from enph459_super_resolution_tpu.sr.fusion import REGISTER_FNS
    from enph459_super_resolution_tpu.train.burst import (evaluate_burst,
                                                          load_burst_run)
    from enph459_super_resolution_tpu.train.data import POOL_KINDS

    apply_fn, ema, cfg = load_burst_run(args.run)
    pool_images = int(cfg.get("pool_images", 64))
    seed = int(cfg.get("seed", 0))
    pool_kind = cfg.get("pool", "synthetic")
    size = max(int(cfg.get("lr_patch", 24)) * int(cfg.get("factor", 2))
               + 32, 192)
    pool = POOL_KINDS[pool_kind](n_images=pool_images, channels=1,
                                 seed=seed, size=size)
    n_eval = max(2, len(pool) // 8)
    register = REGISTER_FNS[cfg.get("model", "burstfusion")]

    rows = []
    for jit_sigma, noise in DEFAULT_POINTS:
        row = evaluate_burst(apply_fn, ema, pool[:n_eval],
                             factor=cfg["factor"], noise_sigma=noise,
                             jitter_sigma=jit_sigma,
                             n_iter=args.eval_iters, refine=args.refine,
                             register=register)
        row.update(jitter=jit_sigma, noise=noise, run=args.run,
                   model=cfg.get("model", "burstfusion"))
        print(json.dumps(row), flush=True)
        rows.append(row)
    if args.out:
        with open(args.out, "w") as fp:
            for r in rows:
                fp.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
