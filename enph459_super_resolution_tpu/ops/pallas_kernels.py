"""Pallas TPU kernels for the banded-operator hot path.

:class:`~.opmatrix.BandedOp` executes as XLA block matmuls + a concat; this
module provides the same contraction as ONE Pallas kernel: the band blocks
live stacked in HBM, each grid step DMAs its input window (whose start is a
scalar-prefetched index — windows are NOT block-aligned, so BlockSpec index
maps can't express them) into VMEM and runs a single MXU matmul straight
into its output tile.  No intermediate HBM round-trips, no concat.

Status (measured on the target chip): the kernel is the DEFAULT row-apply
path on TPU backends (``SRTPU_PALLAS_ROWS=auto``).  The round-1 in-loop
blocker — XLA placing the custom call's 25 MB result in scoped VMEM inside
the IBP ``fori_loop`` and OOMing the 16 MB budget — is resolved by pinning
both x and out in HBM (``memory_space=ANY``) and moving tiles with explicit
double-buffered DMAs (w_tile=256 keeps the scratch under the scoped
budget).  In-loop it measures equal-or-faster than the XLA block-matmul
path (0.57-0.59 s vs 0.61-0.63 s per 80-iter solve, same-day tunnel) with
bit-identical results.  Correctness is pinned against the XLA path in
tests (interpret mode on CPU; compiled standalone on TPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_kernel(starts_ref, band_ref, x_hbm, out_hbm, x_vmem, out_vmem,
                in_sems, out_sems):
    """One (row-block, W-tile) grid step: DMA the window, matmul, DMA out.

    Both the input window and the output tile move via explicit DMAs with
    the full arrays pinned in HBM (``memory_space=ANY``).  Keeping the
    custom call's operand/result buffers out of VMEM matters: inside the
    IBP ``fori_loop`` XLA otherwise places the 25 MB result in scoped VMEM
    and blows the 16 MB budget (measured on the target chip).

    Double-buffered: each step prefetches the NEXT step's input window
    while the current matmul runs, and output DMAs drain in the background
    (waited two steps later, before their slot is reused).  Grid iteration
    order is (row-block, then W-tile) with W fastest.
    """
    b = pl.program_id(0)
    wt = pl.program_id(1)
    nwt = pl.num_programs(1)
    n_steps = pl.num_programs(0) * nwt
    step = b * nwt + wt
    slot = step % 2
    nslot = (step + 1) % 2
    blk, tw = out_vmem.shape[-2:]
    win = x_vmem.shape[-2]

    def in_dma(s, bb, wtt):
        # starts are 8-row aligned (pack_banded): Mosaic must prove HBM
        # slice starts divide the (8, 128) tiling
        start = pl.multiple_of(starts_ref[bb], 8)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, win), pl.ds(wtt * tw, tw)],
            x_vmem.at[s], in_sems.at[s])

    def out_dma(s, bb, wtt):
        return pltpu.make_async_copy(
            out_vmem.at[s],
            out_hbm.at[pl.ds(bb * blk, blk), pl.ds(wtt * tw, tw)],
            out_sems.at[s])

    @pl.when(step == 0)
    def _():
        in_dma(slot, b, wt).start()

    @pl.when(step + 1 < n_steps)
    def _():
        nb = jnp.where(wt + 1 < nwt, b, b + 1).astype(jnp.int32)
        nwt_i = (wt + 1) % nwt
        in_dma(nslot, nb, nwt_i).start()

    in_dma(slot, b, wt).wait()
    # before overwriting this out slot, drain the DMA issued 2 steps ago
    # (same slot, same byte count — semaphore waits only count bytes)
    @pl.when(step >= 2)
    def _():
        out_dma(slot, b, wt).wait()
    out_vmem[slot] = jnp.dot(band_ref[0], x_vmem[slot],
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    out_dma(slot, b, wt).start()

    # final step: drain every in-flight output DMA before the kernel exits
    @pl.when(step == n_steps - 1)
    def _():
        out_dma(slot, b, wt).wait()

    @pl.when((step == n_steps - 1) & (n_steps >= 2))
    def _():
        out_dma(nslot, b, wt).wait()


@functools.partial(jax.jit,
                   static_argnames=("n_out", "win", "w_tile", "interpret"))
def _banded_row_pallas(starts, bands, x, n_out: int, win: int,
                       w_tile: int, interpret: bool = False):
    """out[b*B:(b+1)*B, :] = bands[b] @ x[starts[b]:starts[b]+win, :]."""
    n_blocks, blk, _ = bands.shape
    w = x.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks, w // w_tile),
        in_specs=[
            pl.BlockSpec((1, blk, win), lambda b, wt, starts: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # out stays in HBM
        scratch_shapes=[
            pltpu.VMEM((2, win, w_tile), x.dtype),   # double-buffered in
            pltpu.VMEM((2, blk, w_tile), x.dtype),   # double-buffered out
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _row_kernel,
        out_shape=jax.ShapeDtypeStruct((n_blocks * blk, w), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, bands, x)
    return out[:n_out]


def pack_banded(op, pad_to: int = 128,
                align: int = 8) -> Tuple[np.ndarray, np.ndarray, int]:
    """Stack a BandedOp's blocks into (starts[i], bands[n,B,S]) with one
    shared window size (max over blocks, lane-padded) and ``align``-row
    aligned window starts (HBM slices must divide the sublane tiling)."""
    blk = max(b.shape[0] for b in op.blocks)
    aligned_lo = [(lo // align) * align for lo, _ in op.col_ranges]

    def starts_for(win):
        max_start = max(((op.n_in - win) // align) * align, 0)
        return [min(alo, max_start) for alo in aligned_lo]

    # Fixed point: clamping a start DOWN to the aligned in-bounds maximum
    # can push (hi - start) past the window; widen until every block fits
    # (converges in <= 2 steps, or degenerates to full width).
    win = max(hi - alo for (_, hi), alo in zip(op.col_ranges, aligned_lo))
    win = -(-win // pad_to) * pad_to
    while True:
        win = min(win, -(-op.n_in // pad_to) * pad_to)
        needed = max(hi - s for (_, hi), s in zip(op.col_ranges,
                                                  starts_for(win)))
        if needed <= win or win >= op.n_in:
            break
        win = -(-needed // pad_to) * pad_to

    n = len(op.blocks)
    bands = np.zeros((n, blk, win), dtype=np.asarray(op.blocks[0]).dtype)
    starts = np.asarray(starts_for(win), dtype=np.int32)
    for i, (b, (lo, hi)) in enumerate(zip(op.blocks, op.col_ranges)):
        b = np.asarray(b)
        bands[i, : b.shape[0], lo - starts[i]: hi - starts[i]] = b
    return starts, bands, blk


def banded_row_apply(op, x, w_tile: int = 256, interpret: bool = False):
    """Pallas execution of ``op @ x`` along x's row (-2) axis.

    ``x``'s trailing width must be a multiple of ``w_tile`` (callers pad);
    2-D input only (batch via vmap).
    """
    starts, bands, blk = pack_banded(op)
    n_pad = len(op.blocks) * blk - op.n_out
    del n_pad
    return _banded_row_pallas(jnp.asarray(starts), jnp.asarray(bands, x.dtype),
                              x, op.n_out, bands.shape[-1], w_tile,
                              interpret)
