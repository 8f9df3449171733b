"""1-D image operators as dense banded matrices for the MXU.

Measured on the target TPU backend (see bench notes in the repo history):
strided slices (`x[::2, ::2]`) and long unrolled tap-sums compile to
pathological data-movement kernels, while dense matmuls run at a steady
~15 TFLOP/s f32 on the MXU.  So the classical SR hot path encodes every
1-D stage — PSF blur, cubic-spline prefilter, sub-pixel phase, decimation,
zero-stuffing, and SciPy's exact boundary semantics — as entries of one
(n_out, n_in) matrix per axis, built host-side in float64 at trace time and
applied as ``M_row @ img @ M_col^T``.

Boundary encoding: an extended-signal index is mapped to a source column by
the same rules the conv path replicates from SciPy (mode 'nearest' ==
12-sample edge pre-pad, then symmetric prefilter extension, see
ops.resample docstring), so the matrix path is numerically identical to the
validated conv path — same math, different execution strategy.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .resample import bspline_prefilter_kernel, cubic_bspline_weights


def _ext_index(e: np.ndarray, n: int, mode: str) -> np.ndarray:
    """Map extended-signal indices to source indices per SciPy semantics."""
    e = np.asarray(e, dtype=np.int64)
    if mode == "nearest":
        npad = 12  # scipy _prepad_for_spline_filter
        m = n + 2 * npad
        ep = e + npad
        ep = ep % (2 * m)
        ep = np.where(ep >= m, 2 * m - 1 - ep, ep)  # symmetric beyond pre-pad
        return np.clip(ep - npad, 0, n - 1)          # edge pre-pad region
    if mode == "mirror":
        if n == 1:
            return np.zeros_like(e)
        period = 2 * (n - 1)
        ep = np.abs(e) % period
        return np.where(ep >= n, period - ep, ep)
    if mode == "reflect":
        m = 2 * n
        ep = e % m
        return np.where(ep >= n, m - 1 - ep, ep)
    if mode in ("wrap", "grid-wrap"):
        return e % n
    raise ValueError(f"unsupported mode {mode!r}")


def _band_matrix(n_out: int, n_in: int, kernel: np.ndarray, offset: int,
                 mode: Optional[str], stride: int = 1) -> np.ndarray:
    """M[i, map(i*stride + offset + j)] += kernel[j].

    ``mode=None`` means zero boundary (taps falling outside are dropped) —
    fftconvolve-'same' semantics.  Kept as the dense reference
    implementation for tests; the production build path is
    :func:`band_from_kernel`, which produces identical entries without ever
    allocating the (n_out, n_in) matrix.
    """
    m = np.zeros((n_out, n_in), dtype=np.float64)
    rows = np.arange(n_out, dtype=np.int64)
    for j, kj in enumerate(np.asarray(kernel, dtype=np.float64)):
        if kj == 0.0:
            continue
        e = rows * stride + offset + j
        if mode is None:
            ok = (e >= 0) & (e < n_in)
            np.add.at(m, (rows[ok], e[ok]), kj)
        else:
            np.add.at(m, (rows, _ext_index(e, n_in, mode)), kj)
    return m


# ---------------------------------------------------------------------------
# Analytic banded construction (host side).
#
# Every operator this module builds is banded: row i has nonzeros only in a
# ~40-50-wide column window.  Round 1-3 materialized the full dense
# (n_out, n_in) float64 matrix first (12k x 12k at the flagship size) and
# scanned it for nonzeros — 15-50 s of single-core numpy per cold config,
# and >10 min for the batched-adjoint operator set (PERF_NOTES round-3
# boundary).  The band entries are analytically known from the
# kernel/shift/stride algebra, so HostBanded stores only (data[n_out, W],
# start[n_out]) with M[i, start[i]+k] = data[i, k], and all construction,
# composition, column decimation, and transposition run in
# O(n_out * W * W') — milliseconds at flagship size.  The dense public
# functions below now *derive* from this representation, so both formats
# come from one construction algorithm (entry-for-entry identical; see
# tests/test_opmatrix_analytic.py).
# ---------------------------------------------------------------------------


class HostBanded:
    """Host-side banded matrix: ``M[i, start[i] + k] = data[i, k]``.

    All nonzero columns of row ``i`` lie in ``[start[i], start[i] + W)``
    with ``0 <= start[i]`` and ``start[i] + W <= n_in`` (windows are derived
    from actually-touched columns, so they never overhang the matrix).
    """

    __slots__ = ("data", "start", "n_in")

    def __init__(self, data: np.ndarray, start: np.ndarray, n_in: int):
        self.data = data          # (n_out, W) float64
        self.start = start        # (n_out,) int64
        self.n_in = int(n_in)

    @property
    def shape(self):
        return (self.data.shape[0], self.n_in)

    @property
    def width(self) -> int:
        return self.data.shape[1]

    def to_dense(self, dtype=np.float64) -> np.ndarray:
        n_out, w = self.data.shape
        m = np.zeros((n_out, self.n_in), dtype=np.float64)
        rows = np.repeat(np.arange(n_out), w)
        cols = (self.start[:, None] + np.arange(w)[None, :]).ravel()
        m[rows, cols] = self.data.ravel()
        return m.astype(dtype, copy=False)

    def astype(self, dtype) -> "HostBanded":
        return HostBanded(self.data.astype(dtype), self.start, self.n_in)


def band_from_kernel(n_out: int, n_in: int, kernel: np.ndarray, offset: int,
                     mode: Optional[str], stride: int = 1) -> HostBanded:
    """Banded equivalent of :func:`_band_matrix` — identical entries
    (same tap-order accumulation), no dense intermediate."""
    kernel = np.asarray(kernel, dtype=np.float64)
    nk = len(kernel)
    rows = np.arange(n_out, dtype=np.int64)
    e = rows[:, None] * stride + offset + np.arange(nk, dtype=np.int64)[None]
    if mode is None:
        valid = (e >= 0) & (e < n_in)
        mapped = np.clip(e, 0, n_in - 1)
    else:
        valid = np.ones(e.shape, dtype=bool)
        mapped = _ext_index(e, n_in, mode)
    # window = span of VALID mapped indices per row (empty rows -> [0, 1));
    # start is clamped so start + width <= n_in holds with the GLOBAL width
    # (rows whose own span is narrower just carry leading zeros)
    big = np.where(valid, mapped, np.iinfo(np.int64).max)
    start = np.minimum(big.min(axis=1), n_in - 1)
    small = np.where(valid, mapped, np.iinfo(np.int64).min)
    hi = np.maximum(small.max(axis=1), 0)
    width = min(max(int((hi - start).max()) + 1, 1), n_in)
    start = np.clip(start, 0, n_in - width)
    data = np.zeros((n_out, width), dtype=np.float64)
    for j in range(nk):
        kj = kernel[j]
        if kj == 0.0:
            continue
        ok = valid[:, j]
        # distinct rows -> no intra-assignment collision; folds across
        # different j accumulate in j order, exactly like _band_matrix
        data[rows[ok], mapped[ok, j] - start[ok]] += kj
    return HostBanded(data, start, n_in)


def band_compose(a: HostBanded, b: HostBanded) -> HostBanded:
    """``A @ B`` in banded form (requires ``a.n_in == b.shape[0]``).

    Accumulates over A's taps in column order — f64 summation order differs
    from BLAS dgemm only in the last ulps, which vanish at the f32 cast the
    device operators take (verified entry-exact on all workload configs in
    tests).
    """
    if a.n_in != b.shape[0]:
        raise ValueError(f"compose shape mismatch: {a.shape} @ {b.shape}")
    n_out, wa = a.data.shape
    wb = b.data.shape[1]
    rows_b = a.start[:, None] + np.arange(wa, dtype=np.int64)[None, :]
    sb = b.start[rows_b]                     # (n_out, wa) contributing starts
    c_start = sb.min(axis=1)
    width = int((sb.max(axis=1) - c_start).max()) + wb
    c_start = np.clip(c_start, 0, b.n_in - width)  # global-width overhang
    data = np.zeros((n_out, width), dtype=np.float64)
    rows = np.arange(n_out)
    col_base = np.arange(wb, dtype=np.int64)[None, :]
    for k in range(wa):
        coeff = a.data[:, k]
        ok = coeff != 0.0
        if not ok.any():
            continue
        rb = rows_b[ok, k]
        cols = (sb[ok, k] - c_start[ok])[:, None] + col_base
        data[rows[ok, None], cols] += coeff[ok, None] * b.data[rb]
    return HostBanded(data, c_start, b.n_in)


def band_decimate_cols(a: HostBanded, step: int) -> HostBanded:
    """``A[:, ::step]`` in banded form (zero-stuffed-input composition)."""
    n_out, w = a.data.shape
    n_in2 = (a.n_in - 1) // step + 1
    wc = min(max((w - 1) // step + 1, 1), n_in2)
    # first kept output column; clamped so c0 + wc <= n_in2 (slots before
    # the row's own window read as zero via the validity mask below)
    c0 = np.clip(-(-a.start // step), 0, n_in2 - wc)
    cols = (c0 * step - a.start)[:, None] \
        + np.arange(wc, dtype=np.int64)[None, :] * step
    ok = (cols >= 0) & (cols < w)
    data = np.where(
        ok, a.data[np.arange(n_out)[:, None], np.clip(cols, 0, w - 1)], 0.0)
    return HostBanded(data, c0, n_in2)


def band_transpose(a: HostBanded) -> HostBanded:
    """``A^T`` in banded form (adjoint-solver operators)."""
    n_out, w = a.data.shape
    cols = (a.start[:, None] + np.arange(w, dtype=np.int64)[None, :]).ravel()
    rows = np.repeat(np.arange(n_out, dtype=np.int64), w)
    first = np.full(a.n_in, n_out, dtype=np.int64)
    np.minimum.at(first, cols, rows)
    last = np.full(a.n_in, -1, dtype=np.int64)
    np.maximum.at(last, cols, rows)
    empty = last < 0
    first[empty] = 0
    last[empty] = 0
    wt = min(max(int((last - first).max()) + 1, 1), n_out)
    first = np.clip(first, 0, n_out - wt)  # keep start + width <= n_out
    data = np.zeros((a.n_in, wt), dtype=np.float64)
    data[cols, rows - first[cols]] = a.data.ravel()
    return HostBanded(data, first, n_out)


def _sampling_banded(in_size: int, coords: np.ndarray,
                     mode: str) -> HostBanded:
    """Banded twin of ``ops.resample._sampling_matrix`` (4 cubic taps/row,
    SciPy out-of-range index mapping) — identical entries."""
    from .resample import _map_index

    coords = np.asarray(coords, dtype=np.float64)
    j = np.floor(coords).astype(np.int64)
    t = coords - j
    w4 = cubic_bspline_weights(t)            # (n_out, 4)
    idx = j[:, None] - 1 + np.arange(4, dtype=np.int64)[None, :]
    mapped = _map_index(idx, in_size, mode)
    start = mapped.min(axis=1)
    width = min(int((mapped.max(axis=1) - start).max()) + 1, in_size)
    start = np.clip(start, 0, in_size - width)
    data = np.zeros((len(coords), width), dtype=np.float64)
    rows = np.arange(len(coords))
    for k in range(4):  # folds accumulate in k order, like _sampling_matrix
        np.add.at(data, (rows, mapped[:, k] - start), w4[:, k])
    return HostBanded(data, start, in_size)


@functools.lru_cache(maxsize=None)
def shift_op_banded(n_in: int, delta: float, mode: str = "nearest",
                    stride: int = 1, n_out: Optional[int] = None,
                    blur_taps: Optional[Tuple[float, ...]] = None,
                    blur_first: bool = True,
                    dtype_name: str = "float32") -> HostBanded:
    """Banded operator for ``decimate(shift(blur(x)))`` (or blur-last)
    along one axis — the analytic build (no dense intermediate).

    * shift: ``out[i] = spline(x)(i - delta)``, order-3, SciPy 'nearest'
      boundary (reference ``ndi_shift`` semantics).
    * blur_taps: optional correlation taps (odd length, centre-anchored)
      applied with zero boundary (fftconvolve-'same' semantics), before the
      shift (forward model) or after it (back-projection).
    * stride: output decimation (forward model's ``[::f]``).

    ``dtype_name`` selects the prefilter truncation length (the band stays
    float64 until the device cast).
    """
    h = bspline_prefilter_kernel(dtype_name)
    hw = (len(h) - 1) // 2
    s = -float(delta)
    mfloor = math.floor(s)
    w = cubic_bspline_weights(np.float64(s - mfloor))
    g = np.convolve(h, w)
    offset = (mfloor - 1) - hw

    n_out = n_out if n_out is not None else (n_in - 1) // stride + 1
    if blur_taps is None:
        return band_from_kernel(n_out, n_in, g, offset, mode, stride)

    taps = np.asarray(blur_taps, dtype=np.float64)
    bhw = (len(taps) - 1) // 2
    if blur_first:
        # shift matrix maps blurred -> out; blur matrix maps in -> blurred
        b_shift = band_from_kernel(n_out, n_in, g, offset, mode, stride)
        b_blur = band_from_kernel(n_in, n_in, taps, -bhw, None)
        return band_compose(b_shift, b_blur)
    b_blur = band_from_kernel(n_out, n_out, taps, -bhw, None)
    b_shift = band_from_kernel(n_out, n_in, g, offset, mode, stride)
    return band_compose(b_blur, b_shift)


def shift_op_matrix(n_in: int, delta: float, mode: str = "nearest",
                    stride: int = 1, n_out: Optional[int] = None,
                    blur_taps: Optional[Tuple[float, ...]] = None,
                    blur_first: bool = True,
                    dtype_name: str = "float32") -> np.ndarray:
    """Dense view of :func:`shift_op_banded` (kept for tests/tools; the
    solve path consumes the banded form directly)."""
    return shift_op_banded(
        n_in, delta, mode=mode, stride=stride, n_out=n_out,
        blur_taps=blur_taps, blur_first=blur_first,
        dtype_name=dtype_name).to_dense(np.dtype(dtype_name))


@functools.lru_cache(maxsize=None)
def stuff_shift_op_banded(n_lr: int, factor: int, delta: float,
                          mode: str = "nearest",
                          blur_taps: Optional[Tuple[float, ...]] = None,
                          dtype_name: str = "float32") -> HostBanded:
    """Banded back-projection operator along one axis:
    ``blur(shift(zero_stuff(err)))`` (reference
    ``mono_barcodes/run_sr.py:199-209``): (n_lr*factor, n_lr)."""
    n_hr = n_lr * factor
    # shift operator on the HR grid (n_hr x n_hr), then keep only the
    # zero-stuffed source columns (every factor-th).  The prefilter is
    # always the float64-truncated FIR here (matching the historical dense
    # build, which composed via a float64 intermediate).
    del dtype_name  # part of the cache key / dense-cast API only
    b_shift = shift_op_banded(n_hr, delta, mode=mode, blur_taps=blur_taps,
                              blur_first=False, dtype_name="float64")
    return band_decimate_cols(b_shift, factor)


def stuff_shift_op_matrix(n_lr: int, factor: int, delta: float,
                          mode: str = "nearest",
                          blur_taps: Optional[Tuple[float, ...]] = None,
                          dtype_name: str = "float32") -> np.ndarray:
    """Dense view of :func:`stuff_shift_op_banded`."""
    return stuff_shift_op_banded(
        n_lr, factor, delta, mode=mode, blur_taps=blur_taps,
        dtype_name=dtype_name).to_dense(np.dtype(dtype_name))


@functools.lru_cache(maxsize=None)
def zoom_op_banded(n_in: int, factor: float, mode: str = "mirror",
                   dtype_name: str = "float32") -> HostBanded:
    """Banded operator for SciPy ``ndimage.zoom(order=3)`` along one axis:
    cubic sampling on the endpoint-aligned grid composed with the spline
    prefilter (boundary-exact, see ops.resample.spline_zoom)."""
    from .resample import zoom_coords

    del dtype_name  # cache key / dense-cast API only; build is float64
    n_out, coords = zoom_coords(n_in, factor)
    del n_out
    b_sample = _sampling_banded(n_in, coords, mode)
    h = bspline_prefilter_kernel("float64")
    hw = (len(h) - 1) // 2
    b_pref = band_from_kernel(n_in, n_in, h, -hw, mode)
    return band_compose(b_sample, b_pref)


def zoom_op_matrix(n_in: int, factor: float, mode: str = "mirror",
                   dtype_name: str = "float32") -> np.ndarray:
    """Dense view of :func:`zoom_op_banded`."""
    return zoom_op_banded(n_in, factor, mode=mode,
                          dtype_name=dtype_name).to_dense(
                              np.dtype(dtype_name))


def psf_separable_factors(psf: np.ndarray, rel_tol: float = 1e-6):
    """SVD factorization of a 2-D PSF into separable rank-1 terms.

    Returns (rows[R, kh], cols[R, kw]) such that
    ``psf ≈ sum_k outer(rows[k], cols[k])`` with truncation below
    ``rel_tol`` of the leading singular value (a Gaussian PSF is exactly
    rank 1; measured 7x7 pinhole PSFs need 2-3 terms at f32 precision).
    """
    psf = np.asarray(psf, dtype=np.float64)
    u, sv, vt = np.linalg.svd(psf)
    keep = sv > sv[0] * rel_tol
    r = int(keep.sum())
    rows = (u[:, :r] * np.sqrt(sv[:r])).T
    cols = (vt[:r, :].T * np.sqrt(sv[:r])).T
    return rows, cols


# Tuned on the target TPU (see PERF_NOTES.md): a B-row block's nonzero
# column window spans ~2B+43 columns for the stride-2 forward operators,
# so smaller blocks cut band FLOPs almost linearly; the measured optimum
# for the 80-iteration solve is 128 (0.31 s vs 0.63 s at 512 same-day,
# bit-identical results; 64 starts losing to per-block overheads).
# SRTPU_MM_PRECISION=DEFAULT buys a further ~2x but loosens uint8 golden
# parity from +/-1 to +/-3 counts (measured) — HIGHEST is the default
# because strict reference parity is a contract here.  Override via env
# SRTPU_BAND_BLOCK / SRTPU_MM_PRECISION.
_BAND_BLOCK = int(os.environ.get("SRTPU_BAND_BLOCK", "128"))


def _resolve_mm_precision(name: str):
    """Accepts jax.lax.Precision names (HIGHEST/DEFAULT/HIGH) and
    jax.lax.DotAlgorithmPreset names (e.g. BF16_BF16_F32_X3: split-f32
    3-pass bf16 emulation, X6 = full f32 emulation)."""
    if hasattr(jax.lax.Precision, name):
        return getattr(jax.lax.Precision, name)
    return getattr(jax.lax.DotAlgorithmPreset, name)


_MM_PRECISION = _resolve_mm_precision(
    os.environ.get("SRTPU_MM_PRECISION", "HIGHEST"))
# SRTPU_PALLAS_ROWS executes 2-D row-operator applications through the
# Pallas banded kernel (ops/pallas_kernels.py) instead of XLA block matmuls.
# Default 'auto' = on for TPU backends (measured equal-or-faster in the IBP
# loop since the kernel's outputs moved to HBM + double-buffered DMA), off
# elsewhere (a compiled Mosaic kernel can't run on CPU).  Resolved lazily so
# importing this module never initializes a jax backend.
_PALLAS_ROWS_ENV = os.environ.get("SRTPU_PALLAS_ROWS", "auto")


def _pallas_rows_enabled() -> bool:
    if _PALLAS_ROWS_ENV == "auto":
        try:
            return jax.devices()[0].platform == "tpu"
        except RuntimeError:
            return False
    return _PALLAS_ROWS_ENV == "1"


@jax.tree_util.register_pytree_node_class
class BandedOp:
    """A banded 1-D operator as static block decomposition.

    The operator matrices are ~98% zeros (band width ~43 of 3072); storing
    only per-block dense sub-matrices (block rows x their nonzero column
    window) cuts matmul FLOPs ~6-12x while staying pure MXU work — no
    gathers, every slice static.  Registered as a pytree so the blocks can
    ride as jit arguments (big constants blow the remote-compile payload).
    """

    def __init__(self, blocks, col_ranges, n_out: int, n_in: int,
                 packed=None):
        self.blocks = list(blocks)          # leaves: (rows_i, win_i) arrays
        self.col_ranges = tuple(col_ranges)  # static ((lo, hi), ...)
        self.n_out = n_out
        self.n_in = n_in
        # optional Pallas packing: (starts[i32 n], bands[n, B, S]) leaves
        self.packed = packed

    @classmethod
    def from_matrix(cls, m: np.ndarray, block: int = _BAND_BLOCK,
                    dtype_name: str = "float32",
                    pack_pallas: Optional[bool] = None) -> "BandedOp":
        m = np.asarray(m)
        n_out, n_in = m.shape
        nz = m != 0.0
        blocks, ranges = [], []
        for r0 in range(0, n_out, block):
            r1 = min(r0 + block, n_out)
            cols = np.nonzero(nz[r0:r1].any(axis=0))[0]
            lo, hi = (int(cols[0]), int(cols[-1]) + 1) if len(cols) else (0, 1)
            blocks.append(np.ascontiguousarray(
                m[r0:r1, lo:hi], dtype=np.dtype(dtype_name)))
            ranges.append((lo, hi))
        op = cls(blocks, ranges, n_out, n_in)
        return cls._maybe_pack(op, pack_pallas)

    @classmethod
    def from_banded(cls, hb: HostBanded, block: int = None,
                    dtype_name: str = "float32",
                    pack_pallas: Optional[bool] = None) -> "BandedOp":
        """Block decomposition straight from a :class:`HostBanded` — no
        dense (n_out, n_in) intermediate.  Produces the same blocks and
        column ranges :meth:`from_matrix` would on ``hb.to_dense()``:
        per-block windows are trimmed to actually-nonzero columns of the
        dtype-cast entries."""
        block = _BAND_BLOCK if block is None else block
        dtype = np.dtype(dtype_name)
        n_out = hb.data.shape[0]
        cast = hb.data.astype(dtype, copy=False)
        blocks, ranges = [], []
        for r0 in range(0, n_out, block):
            r1 = min(r0 + block, n_out)
            d = cast[r0:r1]
            s = hb.start[r0:r1]
            nzr, nzc = np.nonzero(d)
            if len(nzr):
                cols_abs = s[nzr] + nzc
                lo, hi = int(cols_abs.min()), int(cols_abs.max()) + 1
            else:
                lo, hi = 0, 1
                cols_abs = nzc
            sub = np.zeros((r1 - r0, hi - lo), dtype=dtype)
            sub[nzr, cols_abs - lo] = d[nzr, nzc]
            blocks.append(sub)
            ranges.append((lo, hi))
        op = cls(blocks, ranges, n_out, hb.n_in)
        return cls._maybe_pack(op, pack_pallas)

    @classmethod
    def _maybe_pack(cls, op: "BandedOp",
                    pack_pallas: Optional[bool]) -> "BandedOp":
        if pack_pallas is None:
            pack_pallas = _pallas_rows_enabled()
        if pack_pallas and len(op.blocks) > 1:
            from .pallas_kernels import pack_banded

            starts, bands, _ = pack_banded(op)
            if (starts + bands.shape[-1] <= op.n_in).all():
                op.packed = (starts, bands)
            # else: lane-padded window exceeds the input (tiny axis) — the
            # windowed DMA would run off the end; stay on the XLA path
        return op

    @classmethod
    def tiled(cls, op: "BandedOp", r: int) -> "BandedOp":
        """Block-diagonal replication: ``diag(op, op, ..., op)`` (r copies).

        Applying the tiled operator to ``r`` images concatenated along the
        row axis equals applying ``op`` to each image independently — each
        copy keeps its own boundary entries, so per-rep results are
        bit-identical to separate solves.  This is how batched (multi-rep)
        solves ride the MXU as a few big matmuls instead of a vmap (which
        triggers per-block relayouts ~47x slower on the target backend).
        """
        if r == 1:
            return op
        blocks = [b for _ in range(r) for b in op.blocks]
        ranges = [(lo + k * op.n_in, hi + k * op.n_in)
                  for k in range(r) for lo, hi in op.col_ranges]
        out = cls(blocks, ranges, op.n_out * r, op.n_in * r)
        # Pallas packing assumes only the final block may be shorter than
        # the shared block height; with internal rep boundaries that holds
        # only when the base op's blocks are uniform.
        if op.packed is not None and all(
                b.shape[0] == op.blocks[0].shape[0] for b in op.blocks):
            from .pallas_kernels import pack_banded

            starts, bands, _ = pack_banded(out)
            if (starts + bands.shape[-1] <= out.n_in).all():
                out.packed = (starts, bands)
        return out

    def _is_bf16(self) -> bool:
        return jnp.asarray(self.blocks[0]).dtype == jnp.bfloat16

    def row_apply(self, x):
        """self @ x along x's row (-2) axis."""
        # The Pallas banded kernel computes at HIGHEST; when the precision
        # knob selects a DotAlgorithmPreset (e.g. BF16_BF16_F32_X3), stay
        # on the XLA einsum path so the algorithm actually applies.
        if self.packed is not None and x.ndim == 2 and \
                x.shape[-1] % 256 == 0 and not self._is_bf16() and \
                _MM_PRECISION is jax.lax.Precision.HIGHEST:
            from .pallas_kernels import _banded_row_pallas

            starts, bands = self.packed
            return _banded_row_pallas(
                jnp.asarray(starts), jnp.asarray(bands, x.dtype), x,
                self.n_out, int(bands.shape[-1]), 256)
        if self._is_bf16():
            # bf16 band storage (SRTPU_BAND_STORE=bf16): halve operator
            # HBM traffic; the MXU multiplies bf16 operands natively with
            # f32 accumulation (preferred_element_type) — precision cost
            # is the bf16 rounding of operator entries + image operand
            parts = [
                jnp.einsum("oh,...hw->...ow", jnp.asarray(blk),
                           x[..., lo:hi, :].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
                for blk, (lo, hi) in zip(self.blocks, self.col_ranges)
            ]
        else:
            parts = [
                jnp.einsum("oh,...hw->...ow", jnp.asarray(blk, x.dtype),
                           x[..., lo:hi, :], precision=_MM_PRECISION)
                for blk, (lo, hi) in zip(self.blocks, self.col_ranges)
            ]
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts,
                                                                axis=-2)

    def col_apply(self, x):
        """x @ self^T along x's column (-1) axis."""
        if self._is_bf16():
            parts = [
                jnp.einsum("...hw,ow->...ho",
                           x[..., :, lo:hi].astype(jnp.bfloat16),
                           jnp.asarray(blk),
                           preferred_element_type=jnp.float32)
                for blk, (lo, hi) in zip(self.blocks, self.col_ranges)
            ]
        else:
            parts = [
                jnp.einsum("...hw,ow->...ho", x[..., :, lo:hi],
                           jnp.asarray(blk, x.dtype),
                           precision=_MM_PRECISION)
                for blk, (lo, hi) in zip(self.blocks, self.col_ranges)
            ]
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts,
                                                                axis=-1)

    def astype_band(self, dtype) -> "BandedOp":
        """Copy with blocks stored in ``dtype`` (e.g. bfloat16 for the
        traffic-halving experiment); drops the Pallas pack (the banded
        kernel is f32-only)."""
        blocks = [np.asarray(b).astype(dtype) for b in self.blocks]
        return BandedOp(blocks, self.col_ranges, self.n_out, self.n_in)

    def tree_flatten(self):
        leaves = tuple(self.blocks) + (
            self.packed if self.packed is not None else ())
        aux = (self.col_ranges, self.n_out, self.n_in,
               self.packed is not None)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        col_ranges, n_out, n_in, has_packed = aux
        n = len(col_ranges)
        packed = tuple(leaves[n:]) if has_packed else None
        return cls(leaves[:n], col_ranges, n_out, n_in, packed)


def apply_row(m, x):
    """(n_out, H) @ (..., H, W) along the row axis; accepts a dense matrix
    or a :class:`BandedOp`."""
    if isinstance(m, BandedOp):
        return m.row_apply(x)
    return jnp.einsum("oh,...hw->...ow", jnp.asarray(m, x.dtype), x,
                      precision=jax.lax.Precision.HIGHEST)


def apply_col(m, x):
    """(..., H, W) x (n_out, W)^T along the column axis; accepts a dense
    matrix or a :class:`BandedOp`."""
    if isinstance(m, BandedOp):
        return m.col_apply(x)
    return jnp.einsum("...hw,ow->...ho", x, jnp.asarray(m, x.dtype),
                      precision=jax.lax.Precision.HIGHEST)
