"""Same-session sweep: SRTPU_BAND_BLOCK x band-store mode on the full
reference solve (round-3: re-sweep the block size now that the hybrid
bf16-bulk store halves operator HBM traffic — the f32 sweep that picked
128 predates it; the FLOP/byte balance moved).

The block size is a host-build constant (`ops.opmatrix._BAND_BLOCK`) and
is NOT part of `_compiled_solve`'s jit cache key, so each arm patches the
module constant and clears the solver cache (fresh trace + fresh operator
build per block size; host builds hit the disk op-cache after pass 1).

Run on the real chip with nothing else using the tunnel:
  python scratch/probe_band_block_sweep.py [--blocks 64,128,256] \
      [--stores hybrid:16,bf16] [--reps 5] [--passes 2]
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
    p.add_argument("--blocks", default="64,128,256")
    p.add_argument("--stores", default="hybrid:16")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--n-iter", type=int, default=80)
    p.add_argument("--passes", type=int, default=2,
                   help="interleaved passes to de-confound tunnel drift")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax

    from enph459_super_resolution_tpu.ops import opmatrix
    from enph459_super_resolution_tpu.sr import make_gaussian_psf, solve
    from enph459_super_resolution_tpu.sr.classical import (
        _compiled_solve, to_uint8)

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    shifts = ((0.0, 0.0), (0.5, -0.5), (0.5, 0.5), (-0.5, -0.5), (-0.5, 0.5))
    psf = make_gaussian_psf()
    lrs = jax.device_put(
        rng.uniform(0, 255, (5, 1536, 2048)).astype(np.float32), dev)

    blocks = [int(b) for b in args.blocks.split(",")]
    stores = args.stores.split(",")
    arms = [(b, s) for b in blocks for s in stores]
    times = {a: [] for a in arms}
    outs = {}
    for _ in range(args.passes):
        for b, s in arms:
            opmatrix._BAND_BLOCK = b
            os.environ["SRTPU_BAND_STORE"] = s
            _compiled_solve.cache_clear()  # block isn't in the jit key
            t, out = timed_solves(solve, lrs, psf, shifts, args.n_iter,
                                  args.reps)
            times[(b, s)] += t
            outs[(b, s)] = out

    u = {a: to_uint8(o["ibp"]).astype(np.int16) for a, o in outs.items()}
    ref_key = next((a for a in arms if a[0] == 128), arms[0])
    report = {"platform": dev.platform, "n_iter": args.n_iter,
              "parity_ref": f"block{ref_key[0]}:{ref_key[1]}"}
    for a in arms:
        key = f"block{a[0]}:{a[1]}"
        report[key] = {
            "s_sorted": sorted(round(t, 3) for t in times[a]),
            "median_s": round(float(np.median(times[a])), 3),
        }
        if a != ref_key:
            d = np.abs(u[a] - u[ref_key])
            report[key]["uint8_maxdiff_vs_ref"] = int(d.max())
    print(json.dumps(report))


if __name__ == "__main__":
    main()
