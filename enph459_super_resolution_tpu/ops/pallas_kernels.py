"""Pallas TPU kernels for the banded-operator hot path.

:class:`~.opmatrix.BandedOp` executes as XLA block matmuls + a concat; this
module provides the same contraction as ONE Pallas kernel: the band blocks
live stacked in HBM, each grid step DMAs its input window (whose start is a
scalar-prefetched index — windows are NOT block-aligned, so BlockSpec index
maps can't express them) into VMEM and runs a single MXU matmul straight
into its output tile.  No intermediate HBM round-trips, no concat.

Status (measured on the target chip): standalone, the kernel beats the XLA
block-matmul path ~2x at the solver's shapes (72 ms vs 139 ms per
dispatch-dominated call).  Inside the IBP ``fori_loop``, however, this
backend's XLA insists on placing the custom-call OUTPUT buffer in scoped
VMEM and OOMs the 16 MB budget, so in-loop use is gated behind
``SRTPU_PALLAS_ROWS=1`` until that placement is resolved; the default
engine remains the XLA block-banded path.  Correctness is pinned against
the XLA path in tests (interpret mode on CPU; compiled standalone on TPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_kernel(starts_ref, band_ref, x_hbm, out_ref, x_vmem, sem):
    """One (row-block, W-tile) grid step: DMA the window, matmul, store."""
    b = pl.program_id(0)
    # starts are 8-row aligned (pack_banded): Mosaic must prove HBM slice
    # starts divide the (8, 128) tiling
    start = pl.multiple_of(starts_ref[b], 8)
    wt = pl.program_id(1)
    tw = out_ref.shape[-1]
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(start, x_vmem.shape[0]), pl.ds(wt * tw, tw)],
        x_vmem, sem)
    cp.start()
    cp.wait()
    out_ref[:] = jnp.dot(band_ref[0], x_vmem[:],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)


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
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM
        ],
        out_specs=pl.BlockSpec((blk, w_tile),
                               lambda b, wt, starts: (b, wt),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((win, w_tile), x.dtype),
            pltpu.SemaphoreType.DMA(()),
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


def banded_row_apply(op, x, w_tile: int = 512, interpret: bool = False):
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
