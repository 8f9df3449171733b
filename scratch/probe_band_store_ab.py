"""Same-session A/B: banded-operator storage modes on the full reference
solve (round-3 VERDICT item 7 — the IBP iteration is jointly
roofline-bound and SRTPU_MM_PRECISION=DEFAULT showed FLOPs aren't the
constraint, so attack operator HBM traffic instead).

Arms: f32 (strict-parity default), bf16 (traffic-halving, uint8 +/-2),
and hybrid:<tail> schedules (bf16 bulk + f32 finishing tail — near-bf16
speed while contracting back onto the f32 trajectory).

Run on the real chip with nothing else using the tunnel:
  python scratch/probe_band_store_ab.py [--reps 5] [--n-iter 80]

Arms prefixed ``fused/`` run the whole-iteration Pallas engine
(SRTPU_FUSED_IBP=1): 20% slower than banded at f32-HIGHEST (FLOP
inflation), but with bf16 bands every dot is one native MXU pass, so
``fused/hybrid:16`` / ``fused/bf16`` test whether the kernels' ~3x
traffic cut finally pays.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_solves(solve, lrs, psf, shifts, n_iter, reps):
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
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--n-iter", type=int, default=80)
    p.add_argument("--stores", default="f32,bf16,hybrid:4,hybrid:8,hybrid:16")
    p.add_argument("--passes", type=int, default=2,
                   help="interleaved passes to de-confound tunnel drift")
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

    stores = args.stores.split(",")
    times = {s: [] for s in stores}
    outs = {}
    for _ in range(args.passes):  # interleave arms across passes
        for s in stores:
            if s.startswith("fused/"):
                os.environ["SRTPU_FUSED_IBP"] = "1"
                os.environ["SRTPU_BAND_STORE"] = s.split("/", 1)[1]
            else:
                os.environ["SRTPU_FUSED_IBP"] = "0"
                os.environ["SRTPU_BAND_STORE"] = s
            t, out = timed_solves(solve, lrs, psf, shifts, args.n_iter,
                                  args.reps)
            times[s] += t
            outs[s] = out

    u = {s: to_uint8(o["ibp"]).astype(np.int16) for s, o in outs.items()}
    report = {"platform": dev.platform, "n_iter": args.n_iter}
    for s in stores:
        report[s] = {
            "s_sorted": sorted(round(t, 3) for t in times[s]),
            "median_s": round(float(np.median(times[s])), 3),
        }
        if s != "f32" and "f32" in u:
            d = np.abs(u[s] - u["f32"])
            report[s]["uint8_maxdiff_vs_f32"] = int(d.max())
            report[s]["uint8_meandiff_vs_f32"] = round(float(d.mean()), 4)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
