"""Same-session A/B: f32 vs bf16 banded-operator storage on the full
reference solve (round-3 VERDICT item 7 — the IBP iteration is jointly
roofline-bound and SRTPU_MM_PRECISION=DEFAULT showed FLOPs aren't the
constraint, so try halving operator HBM traffic instead).

Run on the real chip with nothing else using the tunnel:
  python scratch/probe_band_store_ab.py [--reps 7] [--n-iter 80]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_solves(solve, lrs, psf, shifts, n_iter, reps):
    import jax.numpy as jnp

    out = solve(lrs, psf, shifts, n_iter=n_iter)
    float(np.asarray(out["mse_history"][-1]))  # warmup + sync
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = solve(lrs + out["mse_history"][-1] * 1e-12, psf, shifts,
                    n_iter=n_iter)
        float(np.asarray(out["mse_history"][-1]))
        times.append(time.perf_counter() - t0)
    return times, out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=7)
    p.add_argument("--n-iter", type=int, default=80)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax

    from enph459_super_resolution_tpu.sr import make_gaussian_psf, solve
    from enph459_super_resolution_tpu.sr.classical import to_uint8

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    shifts = ((0.0, 0.0), (0.5, -0.5), (0.5, 0.5), (-0.5, -0.5), (-0.5, 0.5))
    psf = make_gaussian_psf()
    lrs = jax.device_put(
        rng.uniform(0, 255, (5, 1536, 2048)).astype(np.float32), dev)

    os.environ["SRTPU_BAND_STORE"] = "f32"
    t_f32, out_f32 = timed_solves(solve, lrs, psf, shifts, args.n_iter,
                                  args.reps)
    os.environ["SRTPU_BAND_STORE"] = "bf16"
    t_bf16, out_bf16 = timed_solves(solve, lrs, psf, shifts, args.n_iter,
                                    args.reps)
    # interleaved second pass to de-confound tunnel drift
    os.environ["SRTPU_BAND_STORE"] = "f32"
    t_f32b, _ = timed_solves(solve, lrs, psf, shifts, args.n_iter, args.reps)
    os.environ["SRTPU_BAND_STORE"] = "bf16"
    t_bf16b, _ = timed_solves(solve, lrs, psf, shifts, args.n_iter,
                              args.reps)

    d = np.abs(to_uint8(out_f32["ibp"]).astype(np.int16) -
               to_uint8(out_bf16["ibp"]).astype(np.int16))
    print(json.dumps({
        "platform": dev.platform,
        "f32_s": sorted(round(t, 3) for t in t_f32 + t_f32b),
        "bf16_s": sorted(round(t, 3) for t in t_bf16 + t_bf16b),
        "f32_median_s": round(float(np.median(t_f32 + t_f32b)), 3),
        "bf16_median_s": round(float(np.median(t_bf16 + t_bf16b)), 3),
        "ibp_uint8_maxdiff": int(d.max()),
        "ibp_uint8_meandiff": round(float(d.mean()), 4),
    }))


if __name__ == "__main__":
    main()
