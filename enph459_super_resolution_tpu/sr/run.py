"""CLI: classical multi-frame SR over capture sessions.

One entry point replacing the reference's four copy-pasted scripts
(``{mono,rgb}_{cal_target,barcodes}/run_sr.py``):

    python -m enph459_super_resolution_tpu.sr.run \
        --workload mono_cal_target --data-dir .../data --output-dir results

Flags mirror the reference CLI (``mono_barcodes/run_sr.py:356-367``):
``--psf {gaussian,measured}``, ``--psf-dir``, ``--data-dir``,
``--output-dir``; plus ``--no-figures`` / ``--force`` / ``--session``.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"],
                   help="force a JAX platform (must be set before jax loads; "
                        "the environment's sitecustomize overrides shell env)")
    args_pre, _ = p.parse_known_args(argv)
    if args_pre.platform:
        # The container's sitecustomize imports jax at startup and latches
        # the platform from the env, so both paths are needed: the env var
        # for clean interpreters, jax.config for hooked ones.
        os.environ["JAX_PLATFORMS"] = args_pre.platform
        import jax
        jax.config.update("jax_platforms", args_pre.platform)

    # Persist compiled executables across CLI invocations (first full-size
    # solve compile costs ~20 s).  jax snapshots the env var at import time
    # and sitecustomize imports jax before us, so the env var alone is a
    # no-op here — go through jax.config (same trap as jax_platforms).
    # (The axon backend compiles server-side and ignores the local cache;
    # this pays off on cpu/tpu platforms.)
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       f"/tmp/jax_cache_srtpu_{os.getuid()}"))

    # Heavy imports only after the platform is pinned.
    from ..psf.kernels import load_measured_psf, make_gaussian_psf
    from .config import WORKLOADS
    from .pipeline import process_workload
    from ..data.sessions import discover_sessions

    p.add_argument("--workload", required=True, choices=sorted(WORKLOADS))
    p.add_argument("--psf", choices=["gaussian", "measured"], default="gaussian")
    p.add_argument("--psf-dir", default=None,
                   help="beam-shift calibration data dir (measured PSF)")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--session", default=None,
                   help="process only this session directory name")
    p.add_argument("--no-figures", action="store_true")
    p.add_argument("--force", action="store_true",
                   help="ignore done.flag sentinels")
    p.add_argument("--batch-reps", dest="batch_reps", action="store_true",
                   default=True,
                   help="solve same-shaped reps as one batched device call "
                        "(default; rep-tiled row operators, per-rep-exact)")
    p.add_argument("--no-batch-reps", dest="batch_reps", action="store_false",
                   help="solve reps sequentially instead")
    p.add_argument("--engine", default="mm", choices=["mm", "conv"],
                   help="compute engine: banded-MXU matmuls (default) or "
                        "fused tap-sum convs (cross-check path)")
    p.add_argument("--solver", default=None, choices=["ibp", "adjoint"],
                   help="iteration scheme: 'ibp' (default — the reference's "
                        "exact algorithm: heuristic back-projection, step "
                        "0.5) or 'adjoint' (true-adjoint Landweber on "
                        "transposed forward operators: stable at step 2.0, "
                        "matches IBP80's truth-PSNR in ~20 iterations — "
                        "~4x fewer; defaults --ibp-iters to workload/4 and "
                        "--ibp-step to 2.0)")
    p.add_argument("--ibp-iters", type=int, default=None,
                   help="override the workload's iteration count")
    p.add_argument("--ibp-step", type=float, default=None,
                   help="override the update step size")
    p.add_argument("--max-batch", type=int, default=4,
                   help="max units per batched device solve (cross-session "
                        "batching; operator memory scales with it)")
    p.add_argument("--sp", default="1", metavar="N|NxM",
                   help="shard each unit's IBP image plane over devices "
                        "(spatial parallelism: ppermute halo exchange over "
                        "ICI, full-array parity with the unsharded solve). "
                        "N = H strips (image H must divide by it); NxM = "
                        "2-D HxW tiles with corner exchange (e.g. 4x2 — "
                        "keeps tiles square-ish past 8 devices, W must "
                        "divide by M)")
    p.add_argument("--watch", type=float, default=None, metavar="SECONDS",
                   help="serve mode: after processing existing sessions, "
                        "keep polling --data-dir every SECONDS for new ones "
                        "(done.flag keeps completed units idempotent; a "
                        "session that fails to load — e.g. still being "
                        "written by collection — is deferred to the next "
                        "poll)")
    p.add_argument("--watch-polls", type=int, default=None,
                   help="stop after this many watch polls (default: forever)")
    p.add_argument("--band-store", default=None,
                   metavar="{f32,bf16,hybrid[:tail]}",
                   help="banded-operator storage (mm engine): f32 = strict "
                        "bit-discipline default; hybrid = bf16-stored "
                        "operators for the bulk of the IBP loop + an f32 "
                        "finishing tail (default 16) — ~1.6x faster at "
                        "+/-1-uint8-of-f32 parity (the production "
                        "throughput mode); bf16 = fastest, parity loosens "
                        "to +/-2 (see PERF_NOTES)")
    p.add_argument("--fusion-run", default=None, metavar="RUN_DIR",
                   help="also run the LEARNED burst engine (a trained "
                        "train.burst run directory) on every unit, writing "
                        "fusion.png and its forward-model MSE alongside the "
                        "classical artifacts (additive; the reference "
                        "schema is untouched)")
    p.add_argument("--fusion-refine", type=int, default=0, metavar="N",
                   help="append N data-consistency (Landweber/IBP) "
                        "iterations seeded from the fusion output — "
                        "regains the classical forward-model fit on real "
                        "sensors while keeping the learned prior's detail "
                        "(metrics.json then also reports "
                        "fusion_forward_mse_raw)")
    p.add_argument("--fusion-dtype", default="f32",
                   choices=["f32", "bf16"],
                   help="burst-fusion trunk compute dtype: bf16 runs the "
                        "convs at the MXU's native bf16 rate (~2x) at "
                        "<0.01 dB held-out PSNR cost (the trunk predicts "
                        "a residual over the f32 SAA base); registration "
                        "and refinement stay f32 either way")
    p.add_argument("--fusion-refine-engine", default="banded",
                   choices=["banded", "vjp"],
                   help="data-consistency engine for --fusion-refine: "
                        "'banded' bakes each unit's static shifts into "
                        "transposed banded-MXU operators (~150x faster "
                        "per iteration at flagship size; scipy-exact "
                        "forward model); 'vjp' keeps one traced-shift "
                        "compile shared across all shift values")
    p.add_argument("--fusion-refine-step", type=float, default=2.0,
                   help="Landweber step for --fusion-refine (2.0 is "
                        "spectrally stable under the exact adjoint; lower "
                        "it only to mimic IBP's 0.5 schedule)")
    p.add_argument("--mm-precision", default=None,
                   metavar="{HIGHEST,DEFAULT,BF16_BF16_F32_X3,...}",
                   help="matmul precision/algorithm for the banded engine "
                        "(jax Precision or DotAlgorithmPreset name). "
                        "BF16_BF16_F32_X3 (split-f32 3-pass bf16 emulation) "
                        "measures +/-1 uint8 of HIGHEST at 1.2x speed, and "
                        "makes the hybrid band-store tail ~1.6x faster "
                        "(PERF_NOTES); HIGHEST is the strict default")
    args = p.parse_args(argv)
    from ..parallel.mesh import parse_sp_spec
    try:
        args.sp = parse_sp_spec(args.sp)
    except ValueError as exc:
        p.error(str(exc))
    if args.band_store:
        os.environ["SRTPU_BAND_STORE"] = args.band_store
    if args.mm_precision:
        from ..ops import opmatrix
        opmatrix._MM_PRECISION = opmatrix._resolve_mm_precision(
            args.mm_precision)

    cfg = WORKLOADS[args.workload]
    solver = args.solver or os.environ.get("SRTPU_SOLVER", "ibp")
    if solver == "adjoint" and args.engine != "mm":
        p.error("--solver adjoint runs on the banded mm engine (the "
                "--sp sharded path supports it via the vjp adjoint)")
    if args.solver:
        # set only after validation: p.error above raises SystemExit, and
        # an in-process caller must not inherit a sticky solver env
        os.environ["SRTPU_SOLVER"] = args.solver
    n_iter = args.ibp_iters
    if n_iter is None and solver == "adjoint":
        # the true-adjoint step converges ~4x faster per iteration at the
        # same truth-PSNR (PERF_NOTES step study)
        n_iter = max(1, round(cfg.ibp_iterations / 4))
    ibp_step = args.ibp_step
    if ibp_step is None and solver == "adjoint":
        ibp_step = 2.0
    if n_iter is not None or ibp_step is not None:
        import dataclasses
        cfg = dataclasses.replace(
            cfg,
            ibp_iterations=n_iter if n_iter is not None
            else cfg.ibp_iterations,
            ibp_step=ibp_step if ibp_step is not None else cfg.ibp_step)
    fusion = None
    if args.fusion_run:
        from .fusion import FusionEngine
        fusion = FusionEngine(args.fusion_run, refine=args.fusion_refine,
                              refine_step=args.fusion_refine_step,
                              dtype=args.fusion_dtype,
                              refine_engine=args.fusion_refine_engine)
        if fusion.factor != cfg.upsample_factor:
            p.error(f"--fusion-run was trained at x{fusion.factor}; "
                    f"workload {cfg.name} is x{cfg.upsample_factor}")
    if args.psf == "measured":
        if not args.psf_dir:
            p.error("--psf measured requires --psf-dir")
        psf = load_measured_psf(args.psf_dir, halfwidth=cfg.psf_size // 2)
    else:
        psf = make_gaussian_psf(cfg.psf_size, cfg.psf_sigma)

    def list_sessions():
        found = discover_sessions(args.data_dir)
        if args.session:
            found = [s for s in found if s.endswith(args.session)]
        return found

    if args.watch is None:
        sessions = list_sessions()
        if not sessions:
            print(f"no sessions found in {args.data_dir}", file=sys.stderr)
            return 1
        t0 = time.time()
        # cross-session unit batching: consecutive same-shaped units across
        # the whole workload solve as single batched device calls
        total = process_workload(sessions, psf, cfg, args.output_dir,
                                 figures=not args.no_figures,
                                 force=args.force,
                                 batch_reps=args.batch_reps,
                                 engine=args.engine,
                                 max_batch=args.max_batch,
                                 sp=args.sp, fusion=fusion)
        print(f"{total} unit(s) processed in {time.time() - t0:.1f}s")
        return 0

    # Serve mode: poll for incoming sessions.  A processed session is
    # skipped on later polls ONLY while its directory listing is unchanged
    # — a collector appending more reps to an already-processed session
    # changes the fingerprint and triggers a reload (done.flag keeps the
    # finished units idempotent).  Failed loads (session mid-write) retry
    # on the next poll.
    def fingerprint(sdir: str) -> frozenset:
        # (name, size, mtime) per entry: a collector REWRITING a file under
        # an existing name must also change the fingerprint, not just
        # additions/removals (missing entries race with deleters: skip)
        out = set()
        for name in os.listdir(sdir):
            try:
                st = os.stat(os.path.join(sdir, name))
                out.add((name, st.st_size, st.st_mtime_ns))
            except OSError:
                out.add((name, -1, -1))
        return frozenset(out)

    def serve(dirs):
        return process_workload(dirs, psf, cfg, args.output_dir,
                                figures=not args.no_figures,
                                force=args.force,
                                batch_reps=args.batch_reps,
                                engine=args.engine,
                                max_batch=args.max_batch,
                                sp=args.sp, fusion=fusion)

    seen: dict = {}  # sdir -> listing fingerprint at last successful pass
    total = polls = 0
    while True:
        changed = []
        for sdir in list_sessions():
            try:
                fp = fingerprint(sdir)
            except OSError:
                continue  # session dir vanished between listing and stat
            if seen.get(sdir) != fp:
                changed.append((sdir, fp))
        if changed:
            print("[watch]", end=" ")
            try:
                # one stream over all changed sessions keeps cross-session
                # unit batching alive in serve mode
                total += serve([s for s, _ in changed])
                seen.update(dict(changed))
            except Exception:  # noqa: BLE001 — isolate the broken session
                for sdir, fp in changed:
                    try:
                        total += serve([sdir])
                        seen[sdir] = fp
                    except Exception as exc:  # noqa: BLE001 — keep serving
                        print(f"  [defer] {os.path.basename(sdir)}: {exc}")
        polls += 1
        if args.watch_polls is not None and polls >= args.watch_polls:
            break
        time.sleep(args.watch)
    print(f"watch done: {total} unit(s) processed over {polls} poll(s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
