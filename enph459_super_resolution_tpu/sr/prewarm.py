"""Prewarm the classical engine's cold-start costs for known workloads.

A fresh ``sr.run`` process pays three one-time costs before its first
solve: the host operator build (~0.6 s since the round-4 analytic banded
build; 15-50 s before), the operator upload, and the remote compile
(~20 s on the tunneled chip).  This tool front-loads all of it:

  * builds and DISK-CACHES the banded operator sets for each workload's
    geometry (``SRTPU_OP_CACHE_DIR``), for single solves and each
    ``--reps`` batch size the pipeline's unit batching will request;
  * triggers the device compile by running one solve on a zeros burst of
    the exact geometry (skip with ``--build-only``), so compile caches
    (local ``JAX_COMPILATION_CACHE_DIR`` on cpu/tpu, server-side on the
    tunneled backend) are hot for the serving process.

Usage::

    python -m enph459_super_resolution_tpu.sr.prewarm \
        [--workloads mono_cal_target,rgb_barcodes] [--reps 1,4] \
        [--data-dir DIR] [--build-only] [--solver adjoint] ...

Shapes/shifts default to the reference nominal geometry per workload
(SURVEY.md §2 config matrix).  ``rgb_cal_target`` reads shifts from each
session's ``metadata.json``, so it can only be warmed from real data —
pass ``--data-dir`` to derive every (shape, shifts, reps) spec from the
actual sessions (works for all workloads and is exact).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

#: Reference nominal LR geometry per workload (SURVEY.md §2):
#: workload -> (n_frames, (h_lr, w_lr)).  rgb workloads are the red Bayer
#: plane of a 1536x2048 sensor.
NOMINAL_GEOMETRY = {
    "mono_cal_target": (5, (1536, 2048)),
    "mono_barcodes": (4, (1536, 2048)),
    "rgb_barcodes": (4, (768, 1024)),
    # rgb_cal_target: metadata-driven shifts; needs --data-dir
}


def warm_specs(cfg, reps_list, data_dir=None, max_batch: int = 4):
    """[(lr_shape, shifts, reps), ...] to warm for one workload.

    With ``data_dir`` the specs come from the real sessions (exact shapes,
    metadata shifts, and the batch sizes unit batching will form);
    otherwise from the reference nominal geometry.
    """
    from ..data.sessions import (CENTER_SHIFT_FILES, CORNER_SHIFTS_LR,
                                 discover_sessions)

    specs = []
    if data_dir:
        from collections import Counter

        groups: Counter = Counter()
        for sdir in discover_sessions(data_dir):
            for unit in cfg.load(sdir):
                groups[(tuple(int(v) for v in unit.frames.shape[-2:]),
                        unit.shifts)] += 1
        for (shape, shifts), count in sorted(groups.items()):
            sizes = {1}
            # the pipeline batches runs of identical units in chunks of
            # max_batch with a remainder chunk
            if count > 1:
                sizes.add(min(count, max_batch))
                if count > max_batch and count % max_batch:
                    sizes.add(count % max_batch)
            for r in sorted(sizes):
                specs.append((shape, shifts, r))
        return specs

    if cfg.name not in NOMINAL_GEOMETRY:
        return []  # metadata-driven shifts: only warmable from real data
    n_frames, shape = NOMINAL_GEOMETRY[cfg.name]
    shifts = (tuple(s for _, s in CENTER_SHIFT_FILES) if n_frames == 5
              else CORNER_SHIFTS_LR)
    for r in sorted(set(int(r) for r in reps_list)):
        specs.append((shape, shifts, r))
    return specs


def prewarm_spec(cfg, psf, lr_shape, shifts, reps: int,
                 build_only: bool = False) -> float:
    """Warm one (shape, shifts, reps) spec; returns elapsed seconds."""
    import numpy as np

    from .classical import (_band_store, _fused_ibp_mode, _solve_matrices,
                            _solver_mode, solve, solve_batch)

    t0 = time.time()
    if build_only:
        # host build + disk cache + upload only — no compile
        _solve_matrices(np.asarray(psf, np.float64), shifts,
                        cfg.upsample_factor, lr_shape, "float32", reps=reps,
                        fused_mode=_fused_ibp_mode(),
                        band_store=_band_store(), solver=_solver_mode())
        return time.time() - t0
    h, w = lr_shape
    zeros = np.zeros((len(shifts), h, w), np.float32)
    if reps == 1:
        out = solve(zeros, psf, shifts, factor=cfg.upsample_factor,
                    n_iter=cfg.ibp_iterations, step=cfg.ibp_step)
        float(np.asarray(out["mse_history"][-1]))  # force execution
    else:
        out = solve_batch(np.broadcast_to(zeros, (reps,) + zeros.shape),
                          psf, shifts, factor=cfg.upsample_factor,
                          n_iter=cfg.ibp_iterations, step=cfg.ibp_step)
        float(np.asarray(out["mse_history"][-1, -1]))
    return time.time() - t0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])
    args_pre, _ = p.parse_known_args(argv)
    if args_pre.platform:
        os.environ["JAX_PLATFORMS"] = args_pre.platform
        import jax
        jax.config.update("jax_platforms", args_pre.platform)
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       f"/tmp/jax_cache_srtpu_{os.getuid()}"))

    import dataclasses

    from ..psf.kernels import load_measured_psf, make_gaussian_psf
    from .config import WORKLOADS

    p.add_argument("--workloads", default=None,
                   help="comma-separated subset (default: all)")
    p.add_argument("--data-dir", default=None,
                   help="derive exact shapes/shifts/batch sizes from the "
                        "real sessions in this directory (required to warm "
                        "rgb_cal_target's metadata shifts); applies to the "
                        "single --workloads entry")
    p.add_argument("--reps", default="1,4",
                   help="comma-separated batch sizes to warm (nominal mode)")
    p.add_argument("--max-batch", type=int, default=4,
                   help="pipeline --max-batch the serving run will use "
                        "(shapes the --data-dir batch-size specs)")
    p.add_argument("--build-only", action="store_true",
                   help="host operator build + disk cache only; skip the "
                        "device solve/compile (fast on any platform)")
    p.add_argument("--psf", choices=["gaussian", "measured"],
                   default="gaussian")
    p.add_argument("--psf-dir", default=None)
    p.add_argument("--solver", default=None, choices=["ibp", "adjoint"])
    p.add_argument("--ibp-iters", type=int, default=None)
    p.add_argument("--band-store", default=None,
                   metavar="{f32,bf16,hybrid[:tail]}")
    p.add_argument("--mm-precision", default=None)
    args = p.parse_args(argv)

    # same env wiring as sr.run — the warm must match the serving config
    if args.band_store:
        os.environ["SRTPU_BAND_STORE"] = args.band_store
    if args.mm_precision:
        from ..ops import opmatrix
        opmatrix._MM_PRECISION = opmatrix._resolve_mm_precision(
            args.mm_precision)
    if args.solver:
        os.environ["SRTPU_SOLVER"] = args.solver
    solver = args.solver or os.environ.get("SRTPU_SOLVER", "ibp")

    names = (args.workloads.split(",") if args.workloads
             else sorted(WORKLOADS))
    if args.data_dir and len(names) != 1:
        p.error("--data-dir applies to exactly one --workloads entry")
    reps_list = [int(r) for r in args.reps.split(",")]

    total = 0
    for name in names:
        cfg = WORKLOADS[name]
        n_iter = (args.ibp_iters if args.ibp_iters is not None
                  else max(1, round(cfg.ibp_iterations / 4))
                  if solver == "adjoint" else cfg.ibp_iterations)
        cfg = dataclasses.replace(
            cfg, ibp_iterations=n_iter,
            ibp_step=2.0 if solver == "adjoint" and args.ibp_iters is None
            else cfg.ibp_step)
        if args.psf == "measured":
            if not args.psf_dir:
                p.error("--psf measured requires --psf-dir")
            psf = load_measured_psf(args.psf_dir,
                                    halfwidth=cfg.psf_size // 2)
        else:
            psf = make_gaussian_psf(cfg.psf_size, cfg.psf_sigma)
        specs = warm_specs(cfg, reps_list, data_dir=args.data_dir,
                           max_batch=args.max_batch)
        if not specs:
            print(f"[{name}] metadata-driven shifts: pass --data-dir to "
                  "warm from real sessions; skipped")
            continue
        for shape, shifts, reps in specs:
            dt = prewarm_spec(cfg, psf, shape, shifts, reps,
                              build_only=args.build_only)
            total += 1
            kind = "built" if args.build_only else "built+compiled"
            print(f"[{name}] {kind} {shape[0]}x{shape[1]} x{len(shifts)} "
                  f"frames reps={reps} solver={solver}: {dt:.1f}s")
    print(f"prewarmed {total} spec(s); op cache: "
          + os.environ.get("SRTPU_OP_CACHE_DIR",
                           f"/tmp/srtpu_opcache_{os.getuid()}"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
