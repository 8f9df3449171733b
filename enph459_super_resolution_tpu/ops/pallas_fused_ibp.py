"""Fused Pallas kernels for the whole IBP iteration (opt-in engine).

Motivation (PERF_NOTES.md round-2 roofline audit): the banded-matmul IBP
iteration looked HBM-traffic-bound — DEFAULT vs HIGHEST matmul precision
(6x the FLOPs) measures the SAME solve time, and the 3.17 ms/iteration
marginal cost matches the ~1.5 GB the 20 separate banded applies move per
iteration at the backend's ~470 GB/s effective bandwidth.  These kernels
fuse each frame's row+col apply (and the error/update elementwise) so
intermediates never leave VMEM.

MEASURED OUTCOME, f32 (full reference size, same session): exact (uint8
+/-1 vs the unfused engine, SAA/native bit-identical) but ~20% SLOWER per
solve (362 vs 292 ms) — the 128-lane alignment of the per-tile column
windows inflates the back-projection's HIGHEST-precision FLOPs ~1.6x (true
window ~171 of 256), outweighing the ~2x traffic cut.  The f32 default
therefore stays on the banded-einsum engine.

THE LOW PACK (:meth:`FusedIBP.astype_bands` to bfloat16) changes that
economics: with bf16 band operands every in-kernel dot is ONE native-rate
MXU pass (f32 operands at HIGHEST are six), so the alignment FLOP
inflation becomes ~free and the traffic cut is the whole story — and the
cut deepens, because a bf16 ``lr_stack`` makes the inter-kernel err stack
bf16 too.  ``sr.classical`` uses it as the bulk phase of the
``SRTPU_BAND_STORE=hybrid`` schedule when ``SRTPU_FUSED_IBP=1``
(measured A/B in PERF_NOTES round-3).

  * :meth:`FusedIBP.fwd_err`  — err_f = lr_f - Fc_f(Fr_f(hr)) for ALL
    frames in one ``pallas_call``: each grid step DMAs one hr window,
    applies the (deduplicated) banded row ops once per unique row
    operator, then each frame's banded col op, and writes LR-space error
    tiles.  The (h_lr, W_hr) intermediate of the unfused path never hits
    HBM.
  * :meth:`FusedIBP.bwd_update` — hr' = clip(hr + s * sum_f Bc_f(Br_f(err_f)))
    in one ``pallas_call``: per HR tile, DMA the error windows of all
    frames, back-project through the banded ops, accumulate, and apply
    the update + clip in-kernel.  Neither the per-frame (H_hr, w_lr)
    intermediates nor the correction field ever hit HBM.

All dots run ``Precision.HIGHEST`` with f32 accumulation — numerically the
same contractions as the unfused engine (same operator entries, same
windows), only the f32 summation grouping differs, so scipy-oracle and
golden-uint8 parity hold (tests).  Operators ride as packed
``(starts, bands)`` arrays; shifts that repeat across frames (the
reference's +-0.5 corner grids) dedup to one banded operator shared by all
frames using it, saving both band DMA traffic and row-dot compute.

Eligibility: f32 2-D images with 128 | h_lr*factor and 256 | w_lr*factor
(every reference workload conforms: 1536x2048 and 768x1024 at factor 2);
anything else stays on the unfused path.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HIGHEST = jax.lax.Precision.HIGHEST


def _dot(a, b):
    """f32 contraction at HIGHEST precision; if either operand is bf16,
    a native-rate bf16 MXU pass with f32 accumulation (the low band-store
    path — HIGHEST on f32 operands means 6 bf16 passes, so bf16 operands
    make the fused kernels' lane-alignment FLOP inflation ~free)."""
    if jnp.bfloat16 in (a.dtype, b.dtype):
        return jax.lax.dot_general(a.astype(jnp.bfloat16),
                                   b.astype(jnp.bfloat16),
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               precision=_HIGHEST,
                               preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------

def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pack_row_group(ops, start_align: int = 8,
                    win_align: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """Pack uniform-block BandedOps onto a SHARED per-block window grid.

    Returns ``(starts[nb] int32, bands[nb, n_ops, block, win] f32)`` such
    that ``op_k @ x`` block ``i`` equals
    ``bands[i, k] @ x[starts[i]:starts[i]+win]``.
    """
    nb = len(ops[0].blocks)
    blk = ops[0].blocks[0].shape[0]
    n_in = ops[0].n_in
    for op in ops:
        if len(op.blocks) != nb or any(b.shape[0] != blk for b in op.blocks):
            raise ValueError("fused pack requires uniform blocks")
    los = [min(op.col_ranges[i][0] for op in ops) for i in range(nb)]
    his = [max(op.col_ranges[i][1] for op in ops) for i in range(nb)]
    alo = [(lo // start_align) * start_align for lo in los]

    def starts_for(win):
        max_start = max(((n_in - win) // start_align) * start_align, 0)
        return [max(min(a, max_start), 0) for a in alo]

    win = _round_up(max(hi - a for hi, a in zip(his, alo)), win_align)
    while True:
        win = min(win, _round_up(n_in, win_align))
        needed = max(hi - s for hi, s in zip(his, starts_for(win)))
        if needed <= win or win >= n_in:
            break
        win = _round_up(needed, win_align)
    if win > n_in:
        raise ValueError("window exceeds input axis; axis too small to fuse")
    starts = np.asarray(starts_for(win), np.int32)
    bands = np.zeros((nb, len(ops), blk, win), np.float32)
    for k, op in enumerate(ops):
        for i, (b, (lo, hi)) in enumerate(zip(op.blocks, op.col_ranges)):
            bands[i, k, :, lo - starts[i]: hi - starts[i]] = np.asarray(b)
    return starts, bands


def _pack_col_group(ops, tile: int = 256,
                    start_align: int = 128) -> Tuple[np.ndarray, np.ndarray]:
    """Like :func:`_pack_row_group` but for column operators, packed per
    ``tile`` output columns and TRANSPOSED for the right-hand dot:

    ``(x @ op_k^T)`` tile ``j`` equals
    ``x[:, starts[j]:starts[j]+win] @ bands[j, k]``
    with ``bands[j, k]`` of shape ``(win, tile)``.
    """
    blk = ops[0].blocks[0].shape[0]
    if tile % blk:
        raise ValueError("tile must be a multiple of the op block")
    group = tile // blk
    nb = len(ops[0].blocks)
    if nb % group:
        raise ValueError("output cols not a multiple of the tile")
    nt = nb // group
    n_in = ops[0].n_in
    los = [min(op.col_ranges[j * group + g][0]
               for op in ops for g in range(group)) for j in range(nt)]
    his = [max(op.col_ranges[j * group + g][1]
               for op in ops for g in range(group)) for j in range(nt)]
    alo = [(lo // start_align) * start_align for lo in los]

    def starts_for(win):
        max_start = max(((n_in - win) // start_align) * start_align, 0)
        return [max(min(a, max_start), 0) for a in alo]

    win = _round_up(max(hi - a for hi, a in zip(his, alo)), start_align)
    while True:
        win = min(win, _round_up(n_in, start_align))
        needed = max(hi - s for hi, s in zip(his, starts_for(win)))
        if needed <= win or win >= _round_up(n_in, start_align):
            break
        win = _round_up(needed, start_align)
    if win > _round_up(n_in, start_align):
        raise ValueError("window exceeds input axis; axis too small to fuse")
    starts = np.asarray(starts_for(win), np.int32)
    bands = np.zeros((nt, len(ops), win, tile), np.float32)
    for k, op in enumerate(ops):
        for j in range(nt):
            for g in range(group):
                b = np.asarray(op.blocks[j * group + g])
                lo, hi = op.col_ranges[j * group + g]
                bands[j, k, lo - starts[j]: hi - starts[j],
                      g * blk:(g + 1) * blk] = b.T
    return starts, bands


def _dedup(mats: Sequence[np.ndarray]) -> Tuple[List[np.ndarray], List[int]]:
    """Unique matrices by content; returns (uniques, index per input)."""
    uniq, idx = [], []
    for m in mats:
        for k, u in enumerate(uniq):
            if u.shape == m.shape and np.array_equal(u, m):
                idx.append(k)
                break
        else:
            idx.append(len(uniq))
            uniq.append(m)
    return uniq, idx


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _window_dma_kernel(body):
    """Shared structure for both kernels: grid (j, i); one manually
    double-buffered input window whose (row, col) start indices come from
    scalar-prefetched arrays; everything else auto-pipelined BlockSpecs."""

    def kernel(sr_ref, sc_ref, *refs):
        # refs: [*auto_inputs, out, xw_scratch, sems]
        xw, sems = refs[-2], refs[-1]
        src = refs[0]          # the HBM-resident windowed input
        j = pl.program_id(0)
        i = pl.program_id(1)
        ni = pl.num_programs(1)
        step = j * ni + i
        n_steps = pl.num_programs(0) * ni
        slot = step % 2
        nslot = (step + 1) % 2
        win_r, win_c = xw.shape[-2:]

        def dma(s, jj, ii):
            r0 = pl.multiple_of(sr_ref[ii], 8)
            c0 = pl.multiple_of(sc_ref[jj], 128)
            if src.ndim == 3:
                sl = src.at[:, pl.ds(r0, win_r), pl.ds(c0, win_c)]
            else:
                sl = src.at[pl.ds(r0, win_r), pl.ds(c0, win_c)]
            return pltpu.make_async_copy(sl, xw.at[s], sems.at[s])

        @pl.when(step == 0)
        def _():
            dma(slot, j, i).start()

        @pl.when(step + 1 < n_steps)
        def _():
            nj = jnp.where(i + 1 < ni, j, j + 1).astype(jnp.int32)
            dma(nslot, nj, (i + 1) % ni).start()

        dma(slot, j, i).wait()
        body(xw[slot], *refs[1:-2])

    return kernel


def _fwd_body(entries, groups):
    """entries: (frame, urow, ucol) per operator term; groups: urow -> rows
    computed once and reused by every term sharing that row operator."""

    def body(xwin, bandr_ref, bandc_ref, lr_ref, err_ref):
        if bandr_ref.dtype == jnp.bfloat16:
            xwin = xwin.astype(jnp.bfloat16)  # one cast, reused per group
        ys = {}
        for u in groups:
            ys[u] = _dot(bandr_ref[0, u], xwin)          # (blk, win_c)
        n_frames = lr_ref.shape[0]
        for f in range(n_frames):
            z = None
            for (ff, u, c) in entries:
                if ff != f:
                    continue
                t = _dot(ys[u], bandc_ref[0, c])          # (blk, tile)
                z = t if z is None else z + t
            # z accumulates in f32 either way; the error tile is stored in
            # the lr/err dtype (bf16 on the low path — halves the
            # inter-kernel err traffic)
            err_ref[f] = (lr_ref[f].astype(jnp.float32) - z).astype(
                err_ref.dtype)

    return body


def _bwd_body(entries, scale: float, clip: Tuple[float, float]):
    def body(ewin, bandr_ref, bandc_ref, hr_ref, out_ref):
        z = None
        for (f, u, c) in entries:
            y = _dot(bandr_ref[0, u], ewin[f])            # (blk, win_c)
            t = _dot(y, bandc_ref[0, c])                  # (blk, tile)
            z = t if z is None else z + t
        out_ref[...] = jnp.clip(hr_ref[...] + scale * z, clip[0], clip[1])

    return body


@functools.partial(
    jax.jit, static_argnames=("entries", "groups", "n_frames", "h_out",
                              "w_out", "interpret"))
def _fwd_call(sr, sc, bandr, bandc, lr_stack, hr, entries, groups,
              n_frames: int, h_out: int, w_out: int, interpret: bool = False):
    nb = sr.shape[0]
    nt = sc.shape[0]
    blk = bandr.shape[-2]
    tile = bandc.shape[-1]
    win_r, win_c = bandr.shape[-1], bandc.shape[-2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),              # hr (windowed)
            pl.BlockSpec((1,) + bandr.shape[1:],
                         lambda j, i, *s: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + bandc.shape[1:],
                         lambda j, i, *s: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_frames, blk, tile),
                         lambda j, i, *s: (0, i, j),
                         memory_space=pltpu.VMEM),             # lr tiles
        ],
        out_specs=pl.BlockSpec((n_frames, blk, tile),
                               lambda j, i, *s: (0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, win_r, win_c), hr.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # err tiles take the lr dtype: bf16 lr (the low band-store path) makes
    # the err stack bf16 end-to-end between the two kernels
    out = pl.pallas_call(
        _window_dma_kernel(_fwd_body(entries, groups)),
        out_shape=jax.ShapeDtypeStruct((n_frames, nb * blk, nt * tile),
                                       lr_stack.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(sr, sc, hr, bandr, bandc, lr_stack)
    return out[:, :h_out, :w_out]


@functools.partial(
    jax.jit, static_argnames=("entries", "scale", "clip", "h_out", "w_out",
                              "interpret"))
def _bwd_call(sr, sc, bandr, bandc, err_stack, hr, entries, scale: float,
              clip: Tuple[float, float], h_out: int, w_out: int,
              interpret: bool = False):
    nb = sr.shape[0]
    nt = sc.shape[0]
    blk = bandr.shape[-2]
    tile = bandc.shape[-1]
    win_r, win_c = bandr.shape[-1], bandc.shape[-2]
    n_frames = err_stack.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),              # err (windowed)
            pl.BlockSpec((1,) + bandr.shape[1:],
                         lambda j, i, *s: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + bandc.shape[1:],
                         lambda j, i, *s: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, tile), lambda j, i, *s: (i, j),
                         memory_space=pltpu.VMEM),             # hr tile
        ],
        out_specs=pl.BlockSpec((blk, tile), lambda j, i, *s: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, n_frames, win_r, win_c), err_stack.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _window_dma_kernel(_bwd_body(entries, scale, clip)),
        out_shape=jax.ShapeDtypeStruct((nb * blk, nt * tile), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(sr, sc, err_stack, bandr, bandc, hr)
    return out[:h_out, :w_out]


# ---------------------------------------------------------------------------
# public pack
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class FusedIBP:
    """Packed per-solve operator bundle driving the two fused kernels.

    Built from the same per-frame operator matrices as the unfused engine
    (``sr.classical._frame_operator_matrices``); rides through jit as a
    pytree (arrays as leaves, static geometry as aux) so the big bands are
    arguments, not baked constants.
    """

    ARRAY_FIELDS = ("f_sr", "f_sc", "f_bandr", "f_bandc",
                    "b_sr", "b_sc", "b_bandr", "b_bandc")

    def __init__(self, arrays, meta):
        for name, v in zip(self.ARRAY_FIELDS, arrays):
            setattr(self, name, v)
        (self.f_entries, self.f_groups, self.b_entries, self.n_frames,
         self.lr_shape, self.hr_shape, self.interpret) = meta

    @classmethod
    def build(cls, frame_mats, lr_shape, hr_shape, reps: int = 1,
              block: int = 128, tile: int = 256,
              interpret: bool = False) -> "FusedIBP":
        """``frame_mats[f] = (fwd_r[t], fwd_c[t], bwd_r[t], bwd_c[t])``
        lists of dense operator matrices over the frame's PSF rank terms.

        ``reps > 1`` rep-tiles the ROW operators block-diagonally (the
        batched-solve layout: reps concatenated along H, column operators
        shared) — identical semantics to ``BandedOp.tiled``.
        """
        from .opmatrix import BandedOp

        def bop(m, tile_reps: int = 1):
            op = BandedOp.from_matrix(np.asarray(m, np.float32), block=block,
                                      pack_pallas=False)
            if any(b.shape[0] != block for b in op.blocks):
                raise ValueError("axis not a multiple of the fused block")
            return BandedOp.tiled(op, tile_reps) if tile_reps > 1 else op

        fr, fc, br, bc, f_entries, b_entries = [], [], [], [], [], []
        for f, (frs, fcs, brs, bcs) in enumerate(frame_mats):
            for t in range(len(frs)):
                f_entries.append((f, len(fr) + t, len(fc) + t))
                b_entries.append((f, len(br) + t, len(bc) + t))
            fr.extend(np.asarray(m, np.float32) for m in frs)
            fc.extend(np.asarray(m, np.float32) for m in fcs)
            br.extend(np.asarray(m, np.float32) for m in brs)
            bc.extend(np.asarray(m, np.float32) for m in bcs)

        # dedup identical operators (the reference's +-0.5 grids share most)
        fr_u, fr_i = _dedup(fr)
        fc_u, fc_i = _dedup(fc)
        br_u, br_i = _dedup(br)
        bc_u, bc_i = _dedup(bc)
        f_entries = tuple((f, fr_i[u], fc_i[c]) for f, u, c in f_entries)
        b_entries = tuple((f, br_i[u], bc_i[c]) for f, u, c in b_entries)
        f_groups = tuple(sorted({u for _, u, _ in f_entries}))

        f_sr, f_bandr = _pack_row_group([bop(m, reps) for m in fr_u])
        f_sc, f_bandc = _pack_col_group([bop(m) for m in fc_u], tile=tile)
        b_sr, b_bandr = _pack_row_group([bop(m, reps) for m in br_u])
        b_sc, b_bandc = _pack_col_group([bop(m) for m in bc_u], tile=tile)

        h, w = lr_shape
        hh, hw = hr_shape
        arrays = tuple(jnp.asarray(a) for a in (
            f_sr, f_sc, f_bandr, f_bandc, b_sr, b_sc, b_bandr, b_bandc))
        meta = (f_entries, f_groups, b_entries, len(frame_mats),
                (h * reps, w), (hh * reps, hw), bool(interpret))
        return cls(arrays, meta)

    # -- kernel entry points ------------------------------------------------

    def fwd_err(self, hr, lr_stack, interpret: bool = None):
        """err[f] = lr[f] - forward_model_f(hr), all frames fused."""
        h, w = self.lr_shape
        interpret = self.interpret if interpret is None else interpret
        return _fwd_call(self.f_sr, self.f_sc, self.f_bandr, self.f_bandc,
                         lr_stack, hr, self.f_entries, self.f_groups,
                         self.n_frames, h, w, interpret=interpret)

    def bwd_update(self, hr, err_stack, scale: float,
                   clip: Tuple[float, float], interpret: bool = None):
        """clip(hr + scale * sum_f back_project_f(err[f])), fused."""
        h, w = self.hr_shape
        interpret = self.interpret if interpret is None else interpret
        return _bwd_call(self.b_sr, self.b_sc, self.b_bandr, self.b_bandc,
                         err_stack, hr, self.b_entries, float(scale),
                         (float(clip[0]), float(clip[1])), h, w,
                         interpret=interpret)

    def astype_bands(self, dtype) -> "FusedIBP":
        """A copy with the four band arrays cast to ``dtype`` (starts stay
        int32).  ``astype_bands(jnp.bfloat16)`` is the low band-store pack:
        every in-kernel dot runs as a native bf16 MXU pass with f32
        accumulation, and feeding it a bf16 ``lr_stack`` makes the
        inter-kernel err stack bf16 too (see ``sr.classical``'s
        ``SRTPU_BAND_STORE`` schedule)."""
        arrays = tuple(
            getattr(self, n).astype(dtype)
            if n.endswith(("bandr", "bandc")) else getattr(self, n)
            for n in self.ARRAY_FIELDS)
        meta = (self.f_entries, self.f_groups, self.b_entries, self.n_frames,
                self.lr_shape, self.hr_shape, self.interpret)
        return FusedIBP(arrays, meta)

    # -- pytree -------------------------------------------------------------

    def tree_flatten(self):
        leaves = tuple(getattr(self, n) for n in self.ARRAY_FIELDS)
        meta = (self.f_entries, self.f_groups, self.b_entries, self.n_frames,
                self.lr_shape, self.hr_shape, self.interpret)
        return leaves, meta

    @classmethod
    def tree_unflatten(cls, meta, leaves):
        return cls(leaves, meta)


def fused_eligible(lr_shape, hr_shape, dtype_name: str,
                   block: int = 128, tile: int = 256) -> bool:
    """The fused kernels require f32 and block/tile-divisible axes (all
    reference workloads conform); others use the unfused engine."""
    h, w = lr_shape
    hh, hw = hr_shape
    return (dtype_name == "float32" and h % block == 0 and hh % block == 0
            and w % tile == 0 and hw % tile == 0)
