"""Classical multi-frame super-resolution: Shift-and-Add + Iterative
Back-Projection, as single jit-compiled XLA graphs.

Reference behavior (re-derived, not ported): the shared SR core duplicated
across the four ``run_sr.py`` scripts — canonical copy
``mono_barcodes/run_sr.py:188-240``:

  * ``forward_model``  = PSF blur -> sub-pixel shift -> decimate
  * ``back_project``   = zero-stuff LR error -> inverse shift -> correlate PSF
  * ``shift_and_add``  = per-frame cubic zoom + shift, averaged
  * ``ibp``            = n_iter gradient-like updates with per-iter MSE log

TPU-first design decisions:

  * Frames are a stacked ``f32[N, H, W]`` tensor; the per-frame loop is
    unrolled at trace time (N is 4-5 and static), so XLA sees one flat
    dataflow graph per iteration and fuses blur/shift/decimate chains.
  * The IBP iteration is a ``lax.fori_loop`` — one compilation, no Python
    in the loop, runs entirely on device; the MSE history is carried as a
    pre-allocated ``f32[n_iter]`` the loop scatters into.
  * The forward model's ``[::f, ::f]`` decimation is fused into the shift's
    final separable conv as a window stride (see ``ops.spline_shift``), and
    the back-projection's zero-stuffing is expressed as a scatter XLA folds
    into the following convolution.
  * Shifts and PSF are trace-time constants: each (shape, shifts, psf,
    iters) combination compiles once and is cached.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import conv2d_same, correlate2d_same, spline_shift, spline_zoom
from ..ops.opmatrix import (
    apply_col,
    apply_row,
    band_transpose,
    psf_separable_factors,
    shift_op_banded,
    stuff_shift_op_banded,
    zoom_op_banded,
)

# Constants shared by all four reference workloads
# (``mono_barcodes/run_sr.py:60-67``).
UPSAMPLE_FACTOR = 2
PSF_SIZE = 7
PSF_SIGMA = 1.0
PSF_HALFWIDTH = 3
IBP_STEP_SIZE = 0.5


def make_gaussian_psf(size: int = PSF_SIZE, sigma: float = PSF_SIGMA) -> np.ndarray:
    """Normalized 2-D Gaussian PSF (``mono_barcodes/run_sr.py:135-142``)."""
    hw = size // 2
    y, x = np.mgrid[-hw:hw + 1, -hw:hw + 1].astype(np.float64)
    k = np.exp(-(x * x + y * y) / (2.0 * float(sigma) ** 2))
    return k / k.sum()


def forward_model(hr, psf, shift_yx, factor: int):
    """HR image -> simulated LR frame: blur, shift by ``shift*factor``,
    decimate (``mono_barcodes/run_sr.py:192-196``).

    The decimation rides the shift's final conv as a window stride, so no
    full-resolution shifted intermediate is ever materialized.
    """
    blurred = conv2d_same(hr, psf)
    return spline_shift(
        blurred,
        (shift_yx[0] * factor, shift_yx[1] * factor),
        strides=(factor, factor),
    )


def back_project(error_lr, psf, shift_yx, factor: int, hr_shape):
    """LR residual -> HR-grid correction (``mono_barcodes/run_sr.py:199-209``).

    Zero-stuff onto the HR grid, shift by ``-shift*factor``, correlate with
    the PSF (== convolve with the flipped PSF).
    """
    h_hr, w_hr = hr_shape
    up = jnp.zeros(error_lr.shape[:-2] + (h_hr, w_hr), dtype=error_lr.dtype)
    up = up.at[..., : error_lr.shape[-2] * factor : factor,
               : error_lr.shape[-1] * factor : factor].set(error_lr)
    shifted = spline_shift(up, (-shift_yx[0] * factor, -shift_yx[1] * factor))
    return correlate2d_same(shifted, psf)


def shift_and_add(lr_stack, shifts_yx: Sequence, factor: int = UPSAMPLE_FACTOR):
    """Cubic zoom each frame, shift into registration, average
    (``mono_barcodes/run_sr.py:212-218``).

    Args:
      lr_stack: ``f32[N, h, w]`` stacked LR frames.
      shifts_yx: static sequence of N ``(dy, dx)`` LR-pixel shifts.
    """
    n = lr_stack.shape[0]
    up = spline_zoom(lr_stack, factor)  # batched matmul resize
    acc = None
    for i in range(n):
        dy, dx = shifts_yx[i]
        term = spline_shift(up[i], (dy * factor, dx * factor))
        acc = term if acc is None else acc + term
    return acc / n


def native_upsample(lr_mean, factor: int = UPSAMPLE_FACTOR):
    """Bicubic-spline zoom of the LR mean (``mono_barcodes/run_sr.py:315``)."""
    return spline_zoom(lr_mean, factor)


# ---------------------------------------------------------------------------
# MXU (banded-matmul) execution path — numerically identical to the conv
# path above, but every 1-D stage is a dense banded matrix so the whole
# iteration runs as large matmuls.  Measured on the target TPU backend,
# strided slices and long tap-sums compile pathologically (see
# ops/opmatrix.py), making this the fast path for the IBP hot loop.
# ---------------------------------------------------------------------------


def _frame_operator_banded(psf, shift_yx, factor: int, lr_shape,
                           dtype_name, solver: str = "ibp"):
    """(fwd_row, fwd_col, bwd_row, bwd_col) :class:`HostBanded` lists over
    PSF rank terms — the analytic host build (no dense intermediates; the
    dense view for tests/the fused pack is :func:`_frame_operator_matrices`).

    Forward: sim = sum_k R_k @ HR @ C_k^T  ==  decimate(shift(conv2d(HR))).
    Backward (solver='ibp', the reference's heuristic back-projection):
              corr = sum_k Br_k @ ERR @ Bc_k^T
              ==  correlate2d(shift^{-1}(zero_stuff(ERR)), psf).
    Backward (solver='adjoint'): Br_k = R_k^T, Bc_k = C_k^T — the TRUE
    adjoint of the forward operator (still banded, same MXU cost).  With
    the exact adjoint the Landweber step is spectrally bounded by
    2/||A||^2 with ||A|| < 1 for blur+decimate, so step ~2.0 is stable
    (vs IBP's 0.5) and reaches IBP80's residual in ~20 iterations at the
    same truth-PSNR (PERF_NOTES round-3 step study).
    The PSF enters via its SVD separable factors (rank 1 for Gaussian).
    """
    h_lr, w_lr = lr_shape
    dy, dx = float(shift_yx[0]), float(shift_yx[1])
    rows_u, cols_v = psf_separable_factors(psf)
    fwd_r, fwd_c, bwd_r, bwd_c = [], [], [], []
    for u, v in zip(rows_u, cols_v):
        # forward blur is a true convolution -> correlation taps = flipped
        fwd_r.append(shift_op_banded(
            h_lr * factor, dy * factor, stride=factor, n_out=h_lr,
            blur_taps=tuple(u[::-1]), blur_first=True, dtype_name=dtype_name))
        fwd_c.append(shift_op_banded(
            w_lr * factor, dx * factor, stride=factor, n_out=w_lr,
            blur_taps=tuple(v[::-1]), blur_first=True, dtype_name=dtype_name))
        if solver == "adjoint":
            bwd_r.append(band_transpose(fwd_r[-1]))
            bwd_c.append(band_transpose(fwd_c[-1]))
            continue
        # back-projection correlates with the PSF -> taps unflipped
        bwd_r.append(stuff_shift_op_banded(
            h_lr, factor, -dy * factor, blur_taps=tuple(u),
            dtype_name=dtype_name))
        bwd_c.append(stuff_shift_op_banded(
            w_lr, factor, -dx * factor, blur_taps=tuple(v),
            dtype_name=dtype_name))
    return fwd_r, fwd_c, bwd_r, bwd_c


def _frame_operator_matrices(psf, shift_yx, factor: int, lr_shape,
                             dtype_name, solver: str = "ibp"):
    """Dense view of :func:`_frame_operator_banded` (tests; the fused-IBP
    pack, which wants contiguous windows)."""
    dt = np.dtype(dtype_name)
    return tuple([hb.to_dense(dt) for hb in ops]
                 for ops in _frame_operator_banded(
                     psf, shift_yx, factor, lr_shape, dtype_name,
                     solver=solver))


def forward_model_mm(hr, mats):
    fwd_r, fwd_c, _, _ = mats
    sim = None
    for r, c in zip(fwd_r, fwd_c):
        term = apply_col(c, apply_row(r, hr))
        sim = term if sim is None else sim + term
    return sim


def back_project_mm(err, mats):
    _, _, bwd_r, bwd_c = mats
    out = None
    for r, c in zip(bwd_r, bwd_c):
        term = apply_col(c, apply_row(r, err))
        out = term if out is None else out + term
    return out


def ibp_step(hr, lr_stack, shifts_yx, psf, factor: int, step: float,
             clip=(0.0, 255.0)):
    """One IBP update over all frames; returns (new_hr, mean MSE)."""
    n = lr_stack.shape[0]
    correction = jnp.zeros_like(hr)
    total_err = jnp.asarray(0.0, dtype=hr.dtype)
    for i in range(n):
        sim = forward_model(hr, psf, shifts_yx[i], factor)
        err = lr_stack[i] - sim
        total_err = total_err + jnp.mean(err * err)
        correction = correction + back_project(err, psf, shifts_yx[i], factor,
                                               hr.shape[-2:])
    hr = hr + step * correction / n
    hr = jnp.clip(hr, clip[0], clip[1])
    return hr, total_err / n


def ibp(lr_stack, shifts_yx, psf, hr_init, factor: int = UPSAMPLE_FACTOR,
        n_iter: int = 80, step: float = IBP_STEP_SIZE, clip=(0.0, 255.0)):
    """Iterative back-projection (``mono_barcodes/run_sr.py:221-240``).

    A ``lax.fori_loop`` over a fixed dataflow graph; returns
    ``(hr, f32[n_iter] per-iteration mean MSE)``.
    """
    def body(it, carry):
        hr, errs = carry
        hr, mse = ibp_step(hr, lr_stack, shifts_yx, psf, factor, step, clip)
        return hr, errs.at[it].set(mse)

    errs0 = jnp.zeros((n_iter,), dtype=hr_init.dtype)
    return jax.lax.fori_loop(0, n_iter, body, (hr_init, errs0))


def _fused_ibp_mode() -> str:
    """SRTPU_FUSED_IBP: 'auto' (default), '0' (force banded), '1' (force
    the fused-iteration Pallas kernels), 'interpret' (interpreter mode —
    CPU-testable).

    'auto' routes each band-store mode to its chip-measured winner
    (PERF_NOTES round-3 A/B, full reference size, same session):

    * f32 / hybrid -> banded einsum: at f32-HIGHEST the fused kernels'
      128-lane window alignment inflates back-projection FLOPs ~1.6x,
      outweighing their ~3x HBM-traffic cut (362 vs 292 ms/solve); and on
      the hybrid schedule's +/-1 parity frontier fused merely ties banded
      (tail 32 needed: 0.199 vs 0.198 s).
    * bf16 -> fused kernels (TPU only): with bf16 band operands every
      in-kernel dot is one native-rate MXU pass, the FLOP inflation is
      ~free, and the traffic cut wins outright — 0.119 vs 0.156 s/solve
      (1.3x), same +/-2 parity class.

    See ops/pallas_fused_ibp.py."""
    return os.environ.get("SRTPU_FUSED_IBP", "auto")


def _fused_engine_on(mode: str, band_store: str, lr_shape, hr_shape,
                     dtype_name: str) -> bool:
    """Resolve SRTPU_FUSED_IBP x SRTPU_BAND_STORE to an engine choice
    (see :func:`_fused_ibp_mode`); always gated on shape eligibility."""
    from ..ops.pallas_fused_ibp import fused_eligible

    if mode in ("1", "interpret"):
        return fused_eligible(lr_shape, hr_shape, dtype_name)
    if mode == "auto" and band_store == "bf16":
        try:
            platform = jax.devices()[0].platform
        except RuntimeError:
            return False
        return (platform == "tpu"
                and fused_eligible(lr_shape, hr_shape, dtype_name))
    return False


def _solver_mode() -> str:
    """SRTPU_SOLVER: 'ibp' (default — the reference's exact algorithm:
    heuristic back-projection, step 0.5) or 'adjoint' (true-adjoint
    Landweber: transposed forward operators, stable at step ~2.0 — same
    truth-PSNR as IBP80 in ~20 iterations; see
    :func:`_frame_operator_matrices`).  CLI: ``sr.run --solver``."""
    mode = os.environ.get("SRTPU_SOLVER", "ibp")
    if mode not in ("ibp", "adjoint"):
        raise ValueError(f"SRTPU_SOLVER={mode!r}: use 'ibp' or 'adjoint'")
    return mode


def _band_store() -> str:
    """SRTPU_BAND_STORE: 'f32' (default), 'bf16', or 'hybrid[:tail]'.

    'bf16' stores banded-operator blocks in bfloat16 and runs the applies
    as native-bf16 MXU matmuls with f32 accumulation.  Halves operator HBM
    traffic (the hypothesis from the round-2 roofline audit: the IBP
    iteration is traffic-bound); costs the bf16 rounding of operator
    entries and image operands, so uint8 golden parity loosens from +/-1
    to a few counts (measured; see PERF_NOTES).  On TPU at eligible shapes
    bf16 auto-routes to the fused whole-iteration Pallas kernels
    (:func:`_fused_engine_on`) — measured 1.3x faster again at the same
    parity class (0.119 vs 0.156 s/solve full size).

    'hybrid[:tail]' (default tail 16) runs the first ``n_iter - tail`` IBP
    iterations with the bf16 operators and the final ``tail`` with f32:
    IBP is a fixed-point iteration, so a short f32 tail contracts the
    bf16-induced deviation back onto the f32 trajectory — near-bf16 speed
    at +/-1-uint8-of-f32 parity.  Tail 16 is the measured strict setting
    (full-size worst-case-noise chip A/B: maxdiff 1 at tail 16, 2 at tail
    <= 8; see PERF_NOTES round-3)."""
    return os.environ.get("SRTPU_BAND_STORE", "f32")


def _hybrid_tail(band_store: str) -> int:
    """Tail length of the f32 finishing phase for 'hybrid[:tail]'."""
    if ":" in band_store:
        return max(0, int(band_store.split(":", 1)[1]))
    return 16


def _host_solve_matrices(psf, shifts_yx, factor, lr_shape, dtype_name,
                         reps=1, solver="ibp", dense_frames=False):
    """Host-side (numpy) build of one solve config's operator pytree.

    Fully analytic since round 4: operators are built as
    :class:`~..ops.opmatrix.HostBanded` bands straight from the
    kernel/shift/stride algebra and block-decomposed without ever
    materializing a dense (n_out, n_in) matrix — the cold flagship build
    dropped from 15-50 s (and >10 min for the 4-rep-tiled adjoint set) of
    single-core numpy to well under a second.  The disk cache in
    :func:`_solve_matrices` now mostly pays for the *upload* dedup, not
    the build.

    Returns ``(mats, frame_mats)``; ``frame_mats`` is the dense per-frame
    operator matrix list, built only when ``dense_frames`` (the fused
    engine's :meth:`FusedIBP.build` consumes it), else None.
    """
    from ..ops.opmatrix import BandedOp

    def bc(hb):
        # column operators: col_apply contracts the blocks directly and
        # never takes the Pallas row path, so packing bands for them would
        # only inflate the upload/HBM footprint (~16% of the payload)
        return BandedOp.from_banded(hb, dtype_name=dtype_name,
                                    pack_pallas=False)

    def br(hb):
        return BandedOp.tiled(
            BandedOp.from_banded(hb, dtype_name=dtype_name), reps)

    h_lr, w_lr = lr_shape
    frame_bands = [_frame_operator_banded(psf, s, factor, lr_shape,
                                          dtype_name, solver=solver)
                   for s in shifts_yx]
    mats = {
        "zoom_r": br(zoom_op_banded(h_lr, factor, dtype_name=dtype_name)),
        "zoom_c": bc(zoom_op_banded(w_lr, factor, dtype_name=dtype_name)),
        "saa": [(br(shift_op_banded(h_lr * factor, dy * factor,
                                    dtype_name=dtype_name)),
                 bc(shift_op_banded(w_lr * factor, dx * factor,
                                    dtype_name=dtype_name)))
                for dy, dx in shifts_yx],
        "frames": [tuple([(br if axis % 2 == 0 else bc)(hb) for hb in ops]
                         for axis, ops in enumerate(fr))
                   for fr in frame_bands],
    }
    frame_mats = None
    if dense_frames:
        dt = np.dtype(dtype_name)
        frame_mats = [tuple([hb.to_dense(dt) for hb in ops] for ops in fr)
                      for fr in frame_bands]
    return mats, frame_mats


_OP_CACHE_VERSION = 4  # v4: analytic banded build (f64 compose in tap order)


def _device_put_dedup(tree):
    """``jax.device_put`` with content dedup: identical leaves (banded
    operators share interior blocks — translates of the same band — and
    whole operators repeat across frames) upload once and alias one device
    buffer.  Cuts the flagship solve's operator upload 147 -> ~44 MB, which
    matters doubly here: the tunneled backend's h2d is both
    bandwidth-constrained and prone to multi-minute first-transfer stalls
    (PERF_NOTES.md).  Safe because operator arguments are never donated.

    Leaves that are already device arrays (e.g. the opt-in FusedIBP pack)
    pass through untouched — hashing them would force a d2h fetch just to
    re-upload the same bytes.
    """
    import hashlib

    leaves, treedef = jax.tree.flatten(tree)
    out: list = [None] * len(leaves)
    index: dict = {}
    unique, pending = [], []  # pending: (leaf position, unique slot)
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, jax.Array):
            out[i] = leaf
            continue
        arr = np.asarray(leaf)
        key = (arr.shape, str(arr.dtype),
               hashlib.sha1(arr.tobytes()).digest())
        slot = index.setdefault(key, len(unique))
        if slot == len(unique):
            unique.append(arr)
        pending.append((i, slot))
    dev = jax.device_put(unique)
    for i, slot in pending:
        out[i] = dev[slot]
    return jax.tree.unflatten(treedef, out)


def _op_cache_path(psf, shifts_yx, factor, lr_shape, dtype_name, reps,
                   fused=False, solver="ibp"):
    """Disk-cache file for a host operator build, or None when disabled.

    Key covers everything that changes cached contents: the build inputs,
    the env knobs baked into :class:`~..ops.opmatrix.BandedOp` (block
    size, Pallas row packing), and whether the fused-IBP frame matrices
    ride along.  The default directory is uid-scoped and 0700 (pickle is
    executable-on-load; never read a cache another user could have
    planted — see the ownership check in :func:`_solve_matrices`).
    """
    import hashlib

    if os.environ.get("SRTPU_OP_CACHE", "1") == "0":
        return None
    from ..ops import opmatrix

    meta = repr((_OP_CACHE_VERSION, psf.shape, str(psf.dtype), shifts_yx,
                 factor, lr_shape, dtype_name, reps, opmatrix._BAND_BLOCK,
                 opmatrix._pallas_rows_enabled(), bool(fused),
                 solver)).encode()
    key = hashlib.sha256(meta + psf.tobytes()).hexdigest()[:32]
    cache_dir = os.environ.get(
        "SRTPU_OP_CACHE_DIR", f"/tmp/srtpu_opcache_{os.getuid()}")
    return os.path.join(cache_dir, f"ops_{key}.pkl")


def _cache_dir_trusted(path: str) -> bool:
    """Only trust a cache directory this uid owns with no group/other
    write access (pickle.load runs arbitrary code)."""
    try:
        st = os.stat(os.path.dirname(path))
    except OSError:
        return False
    return st.st_uid == os.getuid() and not (st.st_mode & 0o022)


def _solve_matrices(psf, shifts_yx, factor, lr_shape, dtype_name, reps=1,
                    fused_mode="0", band_store="f32", solver="ibp"):
    """All operator matrices for one solve config, as a device pytree of
    :class:`BandedOp` block decompositions.

    Passed as jit *arguments*, not baked constants: ~0.5 GB of banded
    matrices embedded in the HLO blows past compile-payload limits (and
    bloats the executable); as block-decomposed arguments they upload once,
    live in HBM, and each application costs only the band's FLOPs.

    ``reps > 1`` builds the batched-solve operators: every ROW operator is
    block-diagonally tiled ``reps`` times (:meth:`BandedOp.tiled`) so that
    ``reps`` images concatenated along H solve in the same graph with
    per-rep-exact boundaries; column operators are shared unchanged.

    The host build is memoized on disk (``SRTPU_OP_CACHE_DIR``, default
    ``/tmp/srtpu_opcache_<uid>``, 0700; disable with ``SRTPU_OP_CACHE=0``)
    — it costs tens of single-core seconds per process at full size
    otherwise.  With the fused engine enabled the dense per-frame operator
    matrices are cached too (the FusedIBP pack itself is rebuilt from them
    per process; it is device-resident, not picklable).
    """
    import pickle

    mode = fused_mode
    from ..ops.pallas_fused_ibp import FusedIBP

    h_lr, w_lr = lr_shape
    fused_on = _fused_engine_on(mode, band_store, lr_shape,
                                (h_lr * factor, w_lr * factor), dtype_name)

    path = _op_cache_path(psf, shifts_yx, factor, lr_shape, dtype_name, reps,
                          fused=fused_on, solver=solver)
    cached = None
    if path and os.path.exists(path) and _cache_dir_trusted(path):
        try:
            with open(path, "rb") as fp:
                cached = pickle.load(fp)
        except Exception:
            cached = None  # stale/corrupt cache entry: rebuild
    if cached is None:
        mats, frame_mats = _host_solve_matrices(psf, shifts_yx, factor,
                                                lr_shape, dtype_name, reps,
                                                solver=solver,
                                                dense_frames=fused_on)
        cached = {"mats": mats}
        if fused_on:
            cached["frame_mats"] = frame_mats
        if path:
            os.makedirs(os.path.dirname(path), mode=0o700, exist_ok=True)
            if _cache_dir_trusted(path):
                tmp = f"{path}.tmp.{os.getpid()}"
                with open(tmp, "wb") as fp:
                    pickle.dump(cached, fp,
                                protocol=pickle.HIGHEST_PROTOCOL)
                os.replace(tmp, path)  # atomic vs concurrent writers

    mats = cached["mats"]
    # Fused-iteration Pallas pack (opt-in): the whole fwd-err and
    # bwd-update of every frame as two kernels per iteration instead of
    # ~20 separate banded applies — ~2x less HBM traffic, bit-compatible
    # contractions (see ops/pallas_fused_ibp.py).
    if fused_on:
        pack = FusedIBP.build(
            cached["frame_mats"], lr_shape, (h_lr * factor, w_lr * factor),
            reps=reps, interpret=(mode == "interpret"))
        if band_store == "f32":
            mats["fused"] = pack
        else:
            # low band store + fused engine: the bf16 pack drives every
            # low iteration (all of them for 'bf16'; the bulk for
            # 'hybrid', whose f32 tail runs the banded "frames" — same
            # tail semantics as the banded hybrid schedule)
            mats["fused_lo"] = pack.astype_bands(jnp.bfloat16)
    if band_store == "bf16" or band_store.startswith("hybrid"):
        # SRTPU_BAND_STORE=bf16: store every banded operator's blocks in
        # bfloat16 (cast post-load — the disk cache stays f32) to halve
        # operator HBM traffic; applies accumulate in f32 on the MXU.
        # Loosens uint8 parity like SRTPU_MM_PRECISION=DEFAULT does.
        # hybrid keeps BOTH copies: the bf16 set ("frames_lo" banded, or
        # "fused_lo" above) drives the bulk of the IBP loop, the untouched
        # f32 "frames" finish it (the one-shot zoom/saa operators stay
        # f32 — they run once, not n_iter times).
        from ..ops.opmatrix import BandedOp as _BOp

        def _cast(v):
            if isinstance(v, _BOp):
                return v.astype_band(jnp.bfloat16)
            if isinstance(v, (list, tuple)):
                return type(v)(_cast(u) for u in v)
            return v
        if band_store == "bf16":
            mats = {k: _cast(v) if k != "fused_lo" else v
                    for k, v in mats.items()}
        elif not fused_on:
            mats = dict(mats)
            mats["frames_lo"] = _cast(mats["frames"])
    return _device_put_dedup(mats)


def _mm_precision_key():
    """The active matmul precision/algorithm, for the solver cache key
    (the einsums read ``opmatrix._MM_PRECISION`` at trace time, so a
    changed knob must map to a fresh cache entry)."""
    from ..ops import opmatrix
    return opmatrix._MM_PRECISION


@functools.lru_cache(maxsize=64)
def _compiled_solve(psf_bytes, psf_shape, psf_dtype, shifts_yx, factor,
                    n_iter, step, clip_max, engine, lr_shape, dtype_name,
                    reps=1, fused_mode="0", band_store="f32",
                    mm_precision=None, solver="ibp"):
    """Jitted full-session solver + its device-resident operator matrices,
    cached per (psf, shifts, shape, config).

    ``reps > 1`` (mm engine only): the input stacks ``reps`` images along H
    (``f32[N, reps*h, w]``) and the row operators are rep-tiled, so one
    graph solves all reps with per-rep-exact boundaries; the MSE history
    then carries a per-rep axis ``f32[n_iter, reps]``.
    """
    psf = np.frombuffer(psf_bytes, dtype=psf_dtype).reshape(psf_shape)
    clip = (0.0, clip_max)
    n = len(shifts_yx)
    if solver == "adjoint":
        # the fused Pallas pack bakes the heuristic bwd ops; the adjoint
        # solver runs the banded engine (its transposed ops are banded too)
        fused_mode = "0"
    mats = _solve_matrices(psf, shifts_yx, factor, lr_shape, dtype_name,
                           reps, fused_mode, band_store,
                           solver=solver) if engine == "mm" else None

    def rep_mse(err):
        err = err.astype(jnp.float32)  # bf16 err (fused low path): f32 MSE
        if reps == 1:
            return jnp.mean(err * err)
        per = err.reshape((reps, err.shape[-2] // reps) + err.shape[-1:])
        return jnp.mean(per * per, axis=(-2, -1))

    @jax.jit
    def run(lr_stack, mats):
        lr_mean = jnp.mean(lr_stack, axis=0)
        if engine == "mm":
            native = apply_col(mats["zoom_c"], apply_row(mats["zoom_r"],
                                                         lr_mean))
            up = apply_col(mats["zoom_c"], apply_row(mats["zoom_r"],
                                                     lr_stack))
            saa = sum(apply_col(c, apply_row(r, up[i]))
                      for i, (r, c) in enumerate(mats["saa"])) / n

            # the low fused pack consumes a bf16 lr_stack (which also
            # makes the inter-kernel err stack bf16); cast ONCE outside
            # the iteration loop
            lr_lo = (lr_stack.astype(jnp.bfloat16)
                     if "fused_lo" in mats else None)

            def body_with(kind, obj):
                # 'fused': whole-iteration Pallas kernels over the given
                # pack (2 kernels, VMEM-resident intermediates —
                # ops/pallas_fused_ibp.py); 'banded': banded-matmul engine
                # over the given per-frame operator set.
                low = (kind == "fused"
                       and obj.f_bandr.dtype == jnp.bfloat16)
                lr_in = lr_lo if low else lr_stack

                def body(it, carry):
                    hr, errs = carry
                    total_err = jnp.zeros(errs.shape[1:], dtype=hr.dtype)
                    if kind == "fused":
                        err = obj.fwd_err(hr, lr_in)
                        for i in range(n):
                            total_err = total_err + rep_mse(err[i])
                        hr = obj.bwd_update(hr, err, step / n, clip)
                        return hr, errs.at[it].set(total_err / n)
                    correction = jnp.zeros_like(hr)
                    for i in range(n):
                        sim = forward_model_mm(hr, obj[i])
                        err = lr_stack[i] - sim
                        total_err = total_err + rep_mse(err)
                        correction = correction + back_project_mm(
                            err, obj[i])
                    hr = jnp.clip(hr + step * correction / n, clip[0],
                                  clip[1])
                    return hr, errs.at[it].set(total_err / n)
                return body

            errs0 = jnp.zeros((n_iter,) + ((reps,) if reps > 1 else ()),
                              dtype=saa.dtype)
            lo_spec = (("fused", mats["fused_lo"]) if "fused_lo" in mats
                       else ("banded", mats["frames_lo"])
                       if "frames_lo" in mats else None)
            hi_spec = (("fused", mats["fused"]) if "fused" in mats
                       else ("banded", mats["frames"]))
            if lo_spec is not None and band_store.startswith("hybrid"):
                # hybrid band store: bulk of the fixed-point iteration on
                # the bf16 operators (banded or fused engine), f32 banded
                # tail contracts the bf16-induced deviation back onto the
                # f32 trajectory (strict-parity fast mode; see
                # _band_store / PERF_NOTES).
                n_lo = n_iter - min(_hybrid_tail(band_store), n_iter)
                carry = jax.lax.fori_loop(
                    0, n_lo, body_with(*lo_spec), (saa, errs0))
                hr, errs = jax.lax.fori_loop(
                    n_lo, n_iter, body_with(*hi_spec), carry)
            elif lo_spec is not None:  # 'bf16': every iteration low
                hr, errs = jax.lax.fori_loop(
                    0, n_iter, body_with(*lo_spec), (saa, errs0))
            else:
                hr, errs = jax.lax.fori_loop(
                    0, n_iter, body_with(*hi_spec), (saa, errs0))
        else:
            native = native_upsample(lr_mean, factor)
            saa = shift_and_add(lr_stack, shifts_yx, factor)
            hr, errs = ibp(lr_stack, shifts_yx, psf, saa, factor, n_iter,
                           step, clip)
        return {
            "lr_mean": lr_mean,
            "native": native,
            "saa": saa,
            "ibp": hr,
            "mse_history": errs,
        }

    return run, mats


def solve(lr_stack, psf, shifts_yx, factor: int = UPSAMPLE_FACTOR,
          n_iter: int = 80, step: float = IBP_STEP_SIZE,
          clip_max: float = 255.0, engine: str = "mm"):
    """Full classical SR solve in ONE compiled graph.

    Computes everything a reference ``process_session`` rep computes
    (``mono_barcodes/run_sr.py:301-335``): the LR mean, its bicubic 2x
    upsample (Native-2x), Shift-and-Add, and SAA-seeded IBP with the MSE
    convergence history.

    Args:
      lr_stack: ``f32[N, h, w]`` registered LR frames (jax or numpy).
      psf: ``(k, k)`` numpy blur kernel (static; baked into the graph).
      shifts_yx: static tuple of N (dy, dx) tuples, LR pixels.
      engine: 'mm' (banded-matmul MXU path, default) or 'conv' (fused
        tap-sum path); both are scipy-parity, see tests.

    Returns dict of ``lr_mean, native, saa, ibp, mse_history``.
    """
    psf = np.asarray(psf, dtype=np.float64)
    shifts_key = tuple((float(dy), float(dx)) for dy, dx in shifts_yx)
    lr_shape = tuple(int(v) for v in lr_stack.shape[-2:])
    dtype_name = str(jnp.asarray(lr_stack).dtype)
    solver = _solver_mode()
    if solver == "adjoint" and engine != "mm":
        raise ValueError("SRTPU_SOLVER=adjoint runs on the banded 'mm' "
                         f"engine only (got engine={engine!r})")
    fn, mats = _compiled_solve(psf.tobytes(), psf.shape, str(psf.dtype),
                               shifts_key, int(factor), int(n_iter),
                               float(step), float(clip_max), engine,
                               lr_shape, dtype_name,
                               fused_mode=_fused_ibp_mode(),
                               band_store=_band_store(),
                               mm_precision=_mm_precision_key(),
                               solver=solver)
    return fn(lr_stack, mats)


def solve_batch(lr_stacks, psf, shifts_yx, factor: int = UPSAMPLE_FACTOR,
                n_iter: int = 80, step: float = IBP_STEP_SIZE,
                clip_max: float = 255.0, engine: str = "mm"):
    """Batched solve over R same-shaped units: ``f32[R, N, h, w]``.

    The reference's unit of scale is a Python loop over sessions/reps
    (``mono_barcodes/run_sr.py:301,393``); here all reps of a session (and
    any same-shaped sessions) solve as ONE compiled graph.  Returns the
    solve dict with a leading R axis, bit-identical per rep to
    :func:`solve` on that rep.

    Execution strategy (mm engine): reps are concatenated along the image
    ROW axis and every row operator is block-diagonally rep-tiled
    (:meth:`~..ops.opmatrix.BandedOp.tiled`), so the batch rides the same
    few large MXU matmuls as a single solve — measured ~40x faster on the
    target backend than the natural ``vmap``, whose per-block einsum
    relayouts dominate.  The conv engine keeps the vmap (its tap-sum
    kernels have no relayout pathology and its 'nearest' boundary taps
    would leak across concatenated reps).
    """
    psf = np.asarray(psf, dtype=np.float64)
    shifts_key = tuple((float(dy), float(dx)) for dy, dx in shifts_yx)
    lr_shape = tuple(int(v) for v in lr_stacks.shape[-2:])
    dtype_name = str(jnp.asarray(lr_stacks).dtype)
    r = int(lr_stacks.shape[0])
    solver = _solver_mode()
    if solver == "adjoint" and engine != "mm":
        raise ValueError("SRTPU_SOLVER=adjoint runs on the banded 'mm' "
                         f"engine only (got engine={engine!r})")
    if engine != "mm" or r == 1:
        fn, mats = _compiled_solve(psf.tobytes(), psf.shape, str(psf.dtype),
                                   shifts_key, int(factor), int(n_iter),
                                   float(step), float(clip_max), engine,
                                   lr_shape, dtype_name,
                                   fused_mode=_fused_ibp_mode(),
                                   band_store=_band_store(),
                                   mm_precision=_mm_precision_key(),
                                   solver=solver)
        return jax.jit(jax.vmap(fn, in_axes=(0, None)))(lr_stacks, mats)

    fn, mats = _compiled_solve(psf.tobytes(), psf.shape, str(psf.dtype),
                               shifts_key, int(factor), int(n_iter),
                               float(step), float(clip_max), engine,
                               lr_shape, dtype_name, reps=r,
                               fused_mode=_fused_ibp_mode(),
                               band_store=_band_store(),
                               mm_precision=_mm_precision_key(),
                               solver=solver)
    n, h, w = lr_stacks.shape[-3:]
    stacked = jnp.asarray(lr_stacks).transpose(1, 0, 2, 3).reshape(n, r * h, w)
    out = fn(stacked, mats)
    fh = factor * h

    def unstack(v, rows):
        return v.reshape((r, rows) + v.shape[-1:])

    return {
        "lr_mean": unstack(out["lr_mean"], h),
        "native": unstack(out["native"], fh),
        "saa": unstack(out["saa"], fh),
        "ibp": unstack(out["ibp"], fh),
        "mse_history": out["mse_history"].T,
    }


def to_uint8(img) -> np.ndarray:
    """Reference output quantization: clip to [0, 255] then TRUNCATE
    (``np.clip(...).astype(np.uint8)``, ``mono_barcodes/run_sr.py:339``)."""
    return np.clip(np.asarray(img), 0, 255).astype(np.uint8)


@functools.lru_cache(maxsize=32)
def _compiled_refine(psf_bytes, psf_shape, psf_dtype, shifts_yx, factor,
                     n_iter, step, clip_max, lr_shape, dtype_name,
                     mm_precision=None):
    """Jitted Landweber data-consistency refinement from an arbitrary HR
    seed, on the banded-MXU adjoint operator set (static shifts; the
    operators are the SAME content-keyed set the ``SRTPU_SOLVER=adjoint``
    path builds, so disk/device caches are shared)."""
    del mm_precision  # cache-key only; einsums read it at trace time
    psf = np.frombuffer(psf_bytes, dtype=psf_dtype).reshape(psf_shape)
    clip = (0.0, clip_max)
    n = len(shifts_yx)
    mats = _solve_matrices(psf, shifts_yx, factor, lr_shape, dtype_name,
                           1, "0", "f32", solver="adjoint")
    frames = mats["frames"]

    @jax.jit
    def run(hr0, lr_stack, mats_arg):
        frames_arg = mats_arg["frames"]

        def body(it, carry):
            hr, errs = carry
            correction = jnp.zeros_like(hr)
            total = jnp.asarray(0.0, dtype=hr.dtype)
            for i in range(n):
                sim = forward_model_mm(hr, frames_arg[i])
                err = lr_stack[i] - sim
                total = total + jnp.mean(err * err)
                correction = correction + back_project_mm(err, frames_arg[i])
            hr = jnp.clip(hr + step * correction / n, clip[0], clip[1])
            return hr, errs.at[it].set(total / n)

        errs0 = jnp.zeros((n_iter,), dtype=hr0.dtype)
        hr, errs = jax.lax.fori_loop(0, n_iter, body, (hr0, errs0))
        # forward-fit of the RETURNED estimate (mse_history[i] is measured
        # before update i, like the reference's convergence log)
        final = jnp.asarray(0.0, dtype=hr.dtype)
        for i in range(n):
            err = lr_stack[i] - forward_model_mm(hr, frames_arg[i])
            final = final + jnp.mean(err * err)
        return hr, errs, final / n

    return run, {"frames": frames}


def landweber_refine(hr0, lr_stack, psf, shifts_yx,
                     factor: int = UPSAMPLE_FACTOR, n_iter: int = 30,
                     step: float = 2.0, clip_max: float = 255.0):
    """True-adjoint Landweber refinement seeded from ``hr0`` on the banded
    MXU engine: ``hr += step * A^T(lr - A hr) / n``, A the scipy-exact
    blur+shift+decimate forward operator and ``A^T`` its transposed banded
    operator set (same band structure, same per-apply cost — the
    ``SRTPU_SOLVER=adjoint`` machinery, ~3 ms/iteration at flagship size
    vs ~0.5 s/iteration for the traced-shift ``jax.vjp`` formulation in
    ``sr.fusion.data_consistency_refine``).  Step 2.0 is spectrally stable
    (operator norm of blur+decimate < 1; PERF_NOTES round-3 step study).

    Shifts must be static (per-unit config — the serving condition); for
    traced shifts (training-time jitter) use the vjp formulation.

    Returns ``(hr, mse_history[n_iter], final_mse)`` where ``final_mse``
    is the forward fit of the returned estimate.
    """
    psf = np.asarray(psf, dtype=np.float64)
    shifts_key = tuple((float(dy), float(dx)) for dy, dx in shifts_yx)
    lr_shape = tuple(int(v) for v in lr_stack.shape[-2:])
    dtype_name = str(jnp.asarray(lr_stack).dtype)
    fn, mats = _compiled_refine(psf.tobytes(), psf.shape, str(psf.dtype),
                                shifts_key, int(factor), int(n_iter),
                                float(step), float(clip_max), lr_shape,
                                dtype_name,
                                mm_precision=_mm_precision_key())
    return fn(hr0, lr_stack, mats)
