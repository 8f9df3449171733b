"""Fused EDSR residual-trunk Pallas kernel (VMEM-resident conv chain).

The round-5 per-stage serving profile (PERF_NOTES) showed the EDSR trunk
bound at 11-18.5 TFLOP/s effective under XLA's conv lowering, while the
same-chip MXU probe (scratch/probe_mxu_shapes.py) sustains 45-55 TFLOP/s
TRUE conv rate when the 3x3 conv is expressed as VMEM-resident matmuls.
This module harvests that gap: it runs a whole group of residual blocks
(conv-relu-conv + skip, models/common.py::ResBlock semantics, 'SAME'
zero-padding as in ``flax.linen.Conv``) inside ONE Pallas kernel, with the
activations never leaving VMEM between convs.

Design (TPU-first, not a port — the reference has no neural stack; this
accelerates the EDSR north-star config from /root/repo/BASELINE.json):

- **Half-split flat layout.** The (H+2)x(W'+2) zero-padded image is
  flattened row-major and split in half: packed row ``r`` holds pixel
  ``r``'s 64 features in lanes 0:64 and pixel ``r + npix/2``'s in lanes
  64:128 — the MXU's native lane width with no 64->128 padding waste,
  and (unlike adjacent-pair packing) a 3x3 tap at pixel offset ``o`` is
  a PURE row shift by ``o`` for both lane halves, so no lane-crossing
  ops are ever needed (Mosaic v5e rejects sub-vreg lane slices and bf16
  lane rotates).  The tap weight is ``blockdiag(W_t, W_t)`` acting on
  both packed pixels at once.  Row shifts are realized as 8-aligned
  window loads plus static value slices (the aligned-load form Mosaic
  accepts; unaligned ``vector.load`` offsets are rejected).
- **Banded grid with halo.** The flat array is split into bands of ``Rp``
  packed rows; each grid step DMAs its band plus a ``halo`` of
  ``n_convs * (W'+3)`` rows into a VMEM slab and runs every conv of
  the group over the slab (validity shrinks one conv-reach per layer; the
  central band stays exact).  Borders/halo wrap-garbage is re-zeroed each
  conv by an in-kernel position mask, which is also what realizes the
  'SAME' zero-padding semantics.
- **MXU shapes.** Per conv, taps are grouped ``g2`` at a time into
  ``[CH, g2*128] @ [g2*128, 128]`` bf16 dots with f32 accumulation
  (g2=1: nine [CH,128]@[128,128] dots — the probe's packed shape,
  89-93 TFLOP/s nominal = ~45 TRUE on chip).

Used by ``models.fused.edsr_apply_fused`` (EDSR serving) and the burst
fusion engine's trunk.  Correctness is pinned against the flax ResBlock
chain in tests/test_pallas_trunk.py (interpret mode on CPU, f32 and bf16).
"""

from __future__ import annotations

import functools
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TAPS = [(t // 3 - 1, t % 3 - 1) for t in range(9)]  # (dr, dc), row-major


def _r8(n: int) -> int:
    return -(-n // 8) * 8


def _geometry(H: int, W: int, n_convs: int, band: int, chunk: int):
    """Static layout numbers shared by the kernel and the host wrapper."""
    stride = W + 2 + ((W + 2) % 2)       # padded width, forced even
    npix = (H + 2) * stride              # flat padded pixels (even)
    npk = npix // 2                      # packed rows holding the image
    halo1 = stride + 1                   # row reach of ONE conv (tap
    # offsets o in [-(stride+1), stride+1] = row shifts in the
    # half-split layout)
    hp = _r8(n_convs * halo1)            # halo rows per band side
    rp = max(_r8(band), hp)              # band rows
    nbands = -(-npk // rp)
    nb = nbands + 2                      # + leading/trailing zero bands
    mp = _r8(stride + 24)                # slab margin (>= tap reach + 8)
    ncch = -(-(rp + 2 * hp) // chunk)    # compute chunks per band
    rs = 2 * mp + ncch * chunk           # slab rows
    return stride, npix, npk, hp, rp, nbands, nb, mp, ncch, rs


def _tap_slots(stride: int, g2: int):
    """Row offset per tap slot, padded to full g2 groups."""
    slots = [dr * stride + dc for dr, dc in _TAPS]
    while len(slots) % g2:
        slots.append(0)                  # zero-weight padding slot
    return slots


def pack_resblock_weights(convs: Sequence[Tuple[np.ndarray, np.ndarray]],
                          g2: int,
                          dtype: Any = jnp.bfloat16):
    """Pack [(kernel HWIO [3,3,C,C], bias [C])...] for one kernel call.

    Returns (w [n_conv, G2, g2*128, 128] dtype, b [n_conv, 1, 128] f32).
    The tap -> group order matches the kernel's slot enumeration.
    """
    n = len(convs)
    c = convs[0][0].shape[-1]
    if convs[0][0].shape != (3, 3, c, c) or c != 64:
        raise ValueError(f"expected [3,3,64,64] kernels, got "
                         f"{convs[0][0].shape}")
    nslots = -(-9 // g2) * g2
    g2_groups = nslots // g2
    w = np.zeros((n, g2_groups, g2 * 128, 128), np.float32)
    b = np.zeros((n, 1, 128), np.float32)
    for ci, (k, bias) in enumerate(convs):
        k = np.asarray(k, np.float32)
        for t, (dr, dc) in enumerate(_TAPS):
            wt = k[dr + 1, dc + 1]                       # [64, 64]
            gi, sj = divmod(t, g2)
            blk = np.zeros((128, 128), np.float32)
            blk[:64, :64] = wt
            blk[64:, 64:] = wt
            w[ci, gi, sj * 128:(sj + 1) * 128] = blk
        b[ci, 0, :64] = np.asarray(bias, np.float32)
        b[ci, 0, 64:] = np.asarray(bias, np.float32)
    return jnp.asarray(w, dtype), jnp.asarray(b, jnp.float32)


def _trunk_kernel(x_hbm, w_ref, b_ref, co_ref, out_hbm, slab_x, slab_t,
                  sem_in, sem_out, *, n_blocks, relu_only, H, W,
                  stride, npix, hp, rp, nbands, mp, ncch, chunk, g2, slots,
                  res_scale, w_glob, dtype):
    """One (batch, band) grid step: DMA band+halo in, run the conv group
    VMEM-resident, DMA the exact central band out.

    ``n_blocks`` residual blocks (2 convs each) when ``relu_only`` is
    False; with ``relu_only`` True the call instead runs ``n_blocks``
    single convs with relu and NO skip (used for plain conv chains).
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    rs = slab_x.shape[0]
    lw = rp + 2 * hp
    g2_groups = len(slots) // g2
    interior = jnp.logical_and(i >= 1, i <= nbands)

    @pl.when(jnp.logical_not(interior))
    def _zero_band():
        slab_x[0:rp, :] = jnp.zeros((rp, 128), dtype)
        cp = pltpu.make_async_copy(slab_x.at[pl.ds(0, rp)],
                                   out_hbm.at[b, pl.ds(i * rp, rp)],
                                   sem_out)
        cp.start()
        cp.wait()

    @pl.when(interior)
    def _band():
        start = pl.multiple_of(i * rp - hp, 8)
        cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(start, lw)],
                                   slab_x.at[pl.ds(mp, lw)], sem_in)
        cp.start()
        # zero margins while the DMA flies
        slab_x[0:mp, :] = jnp.zeros((mp, 128), dtype)
        slab_x[mp + lw:rs, :] = jnp.zeros((rs - mp - lw, 128), dtype)
        slab_t[0:mp, :] = jnp.zeros((mp, 128), dtype)
        slab_t[mp + ncch * chunk:rs, :] = jnp.zeros(
            (rs - mp - ncch * chunk, 128), dtype)
        cp.wait()

        def conv(src, dst, widx, relu, skip):
            def chunk_body(c, _):
                base = mp + c * chunk
                acc = jnp.zeros((chunk, 128), jnp.float32)
                for gi in range(g2_groups):
                    parts = []
                    for sj in range(g2):
                        ro = slots[gi * g2 + sj]
                        # Mosaic requires 8-aligned vector.load offsets:
                        # load an aligned window, slice the remainder
                        # statically (supported on values)
                        ro8 = (ro // 8) * 8
                        rem = ro - ro8
                        if rem == 0:
                            parts.append(src[pl.ds(base + ro8, chunk), :])
                        else:
                            win = src[pl.ds(base + ro8, chunk + 8), :]
                            parts.append(win[rem:rem + chunk, :])
                    a = parts[0] if g2 == 1 else jnp.concatenate(parts,
                                                                 axis=1)
                    wk = w_ref[widx, gi, :, :]
                    acc += jax.lax.dot_general(
                        a, wk, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                acc += b_ref[widx, :, :].astype(jnp.float32)
                if relu:
                    acc = jnp.maximum(acc, 0.0)
                # position mask: realizes 'SAME' zero padding + kills
                # halo wrap-garbage (see module docstring).  Packed row
                # r = pixel r (lanes 0:64) and pixel r + npix/2 (64:128).
                rr = (i - 1) * rp - hp + c * chunk
                sub = jax.lax.broadcasted_iota(jnp.int32, (chunk, 128), 0)
                lane = jax.lax.broadcasted_iota(jnp.int32, (chunk, 128), 1)
                r_pk = rr + sub
                p = r_pk + (lane >= 64).astype(jnp.int32) * (npix // 2)
                # packed-row bound: rows >= npix/2 are band padding, NOT
                # pixels (p < npix alone would alias them onto the
                # first half)
                ok = jnp.logical_and(r_pk >= 0, r_pk < npix // 2)
                ps = jnp.maximum(p, 0)
                row = jnp.floor(ps.astype(jnp.float32) *
                                jnp.float32(1.0) / jnp.float32(stride)
                                ).astype(jnp.int32)
                col = ps - row * stride
                ok = jnp.logical_and(ok, jnp.logical_and(col >= 1,
                                                         col <= W))
                ok = jnp.logical_and(ok, jnp.logical_and(row >= 1,
                                                         row <= H))
                # global-image column mask: when this call runs a strip
                # of a wider image (wstrip path), columns past the TRUE
                # image edge must stay zero at EVERY conv ('SAME'
                # zero-padding semantics), not just at the input
                gcol = col - 1 + co_ref[b]
                ok = jnp.logical_and(ok, jnp.logical_and(gcol >= 0,
                                                         gcol < w_glob))
                acc = acc * ok.astype(jnp.float32)
                if skip:
                    val = (acc * res_scale).astype(dtype) + \
                        slab_x[pl.ds(base, chunk), :]
                else:
                    val = acc.astype(dtype)
                dst[pl.ds(base, chunk), :] = val
                return 0

            jax.lax.fori_loop(0, ncch, chunk_body, 0)

        if relu_only:
            def blk_body(blk, _):
                conv(slab_x, slab_t, blk, relu=True, skip=False)
                slab_x[:, :] = slab_t[:, :]
                return 0
        else:
            def blk_body(blk, _):
                conv(slab_x, slab_t, 2 * blk, relu=True, skip=False)
                conv(slab_t, slab_x, 2 * blk + 1, relu=False, skip=True)
                return 0

        jax.lax.fori_loop(0, n_blocks, blk_body, 0)

        cpo = pltpu.make_async_copy(slab_x.at[pl.ds(mp + hp, rp)],
                                    out_hbm.at[b, pl.ds(i * rp, rp)],
                                    sem_out)
        cpo.start()
        cpo.wait()


@functools.partial(
    jax.jit, static_argnames=("n_blocks", "relu_only", "H", "W", "band",
                              "chunk", "g2", "res_scale", "w_glob",
                              "interpret"))
def _trunk_call(xp, w, bvec, col_off, n_blocks: int, relu_only: bool,
                H: int, W: int, band: int, chunk: int, g2: int,
                res_scale: float, w_glob: int, interpret: bool = False):
    """Run one conv-group kernel over the packed flat array ``xp``
    ([B, NT, 128]) and return the updated array (same layout).

    ``col_off`` ([B] int32, SMEM) is each batch entry's global-image
    column offset (0 for whole images; strip starts for the wstrip path)
    and ``w_glob`` the true image width — together they realize the
    global 'SAME' zero-padding mask (see _trunk_kernel).
    """
    n_convs = n_blocks if relu_only else 2 * n_blocks
    (stride, npix, npk, hp, rp, nbands, nb, mp, ncch, rs) = _geometry(
        H, W, n_convs, band, chunk)
    del npk
    dtype = xp.dtype
    slots = _tap_slots(stride, g2)
    kern = functools.partial(
        _trunk_kernel, n_blocks=n_blocks, relu_only=relu_only, H=H, W=W,
        stride=stride, npix=npix, hp=hp, rp=rp, nbands=nbands, mp=mp,
        ncch=ncch, chunk=chunk, g2=g2, slots=tuple(slots),
        res_scale=res_scale, w_glob=w_glob, dtype=dtype)
    nbatch = xp.shape[0]
    out = pl.pallas_call(
        kern,
        grid=(nbatch, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),     # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # packed weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # biases
            pl.BlockSpec(memory_space=pltpu.SMEM),  # per-batch col offset
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(xp.shape, dtype),
        scratch_shapes=[
            pltpu.VMEM((rs, 128), dtype),   # slab_x
            pltpu.VMEM((rs, 128), dtype),   # slab_t
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w, bvec, col_off)
    return out


def pack_flat(x, H: int, W: int, band: int, n_convs: int, chunk: int):
    """[B, H, W, 64] -> half-split flat [B, NT, 128]: packed row r holds
    pixel r (lanes 0:64) and pixel r + npix/2 (lanes 64:128) of the
    zero-bordered flattened image, plus leading/trailing zero bands."""
    stride, npix, npk, hp, rp, nbands, nb, _, _, _ = _geometry(
        H, W, n_convs, band, chunk)
    del hp
    b = x.shape[0]
    flat = jnp.pad(x, ((0, 0), (1, 1), (1, stride - W - 1), (0, 0)))
    flat = flat.reshape(b, npix, 64)
    xp = jnp.concatenate([flat[:, :npk, :], flat[:, npk:, :]], axis=-1)
    nt = nb * rp
    return jnp.pad(xp, ((0, 0), (rp, nt - rp - npk), (0, 0)))


def unpack_flat(xp, H: int, W: int, band: int, n_convs: int, chunk: int):
    """Inverse of :func:`pack_flat` -> [B, H, W, 64]."""
    stride, npix, npk, _, rp, _, _, _, _, _ = _geometry(
        H, W, n_convs, band, chunk)
    b = xp.shape[0]
    body = xp[:, rp:rp + npk, :]
    flat = jnp.concatenate([body[..., :64], body[..., 64:]], axis=1)
    flat = flat.reshape(b, H + 2, stride, 64)
    return flat[:, 1:H + 1, 1:W + 1, :]


def pack_trunk(convs: Sequence[Tuple[Any, Any]], g2: int, fuse: int,
               dtype: Any = jnp.bfloat16):
    """Host-side one-time packing of a resblock chain's weights.

    ``convs`` holds TWO (kernel [3,3,64,64] HWIO, bias [64]) entries per
    residual block, in order (conv1, conv2) * n.  Returns a list of
    (w_packed, b_packed, n_blocks_in_group) — one entry per kernel call.
    """
    if len(convs) % 2:
        raise ValueError("convs must hold 2 entries per residual block")
    n_blocks = len(convs) // 2
    out = []
    for s in range(0, n_blocks, fuse):
        grp = convs[2 * s:2 * min(s + fuse, n_blocks)]
        wg, bg = pack_resblock_weights(
            [(np.asarray(k), np.asarray(bv)) for k, bv in grp], g2,
            dtype=dtype)
        out.append((wg, bg, len(grp) // 2))
    return out


def fused_resblocks_packed(x, packed, *, res_scale: float = 1.0,
                           band: int = 8192, chunk: int = 1024,
                           g2: int = 2, dtype: Any = jnp.bfloat16,
                           wstrip: int | None = None,
                           interpret: bool = False,
                           _col_off=None, _w_glob: int | None = None):
    """Apply a chain of EDSR residual blocks with the fused kernel.

    Args:
      x: [B, H, W, 64] activations (any float dtype; computed and
        returned in ``dtype``).
      packed: output of :func:`pack_trunk` (weights packed once).
      res_scale: ResBlock residual scaling (models/common.py semantics).
      band / chunk / g2: kernel tile knobs (packed band rows, MXU chunk
        rows, taps per dot group — g2 must match the packing).
      wstrip: split wide images into vertical strips of this width (the
        flat layout's per-conv halo grows with the padded width, so wide
        inputs pay a large band-halo overhead; strips with a
        ``total_convs``-pixel side halo are exact — the same shrink
        argument as parallel/tiled.py — and batch into one kernel
        launch).
    Returns: [B, H, W, 64] in ``dtype``.
    """
    B, H, W, C = x.shape
    if C != 64:
        raise ValueError(f"fused trunk requires 64 features, got {C}")
    if wstrip is not None and W > wstrip:
        halo = 2 * sum(nb for _, _, nb in packed)  # 1 px per conv
        ns = -(-W // wstrip)
        wpad = ns * wstrip
        xs = jnp.pad(x, ((0, 0), (0, 0), (halo, halo + wpad - W), (0, 0)))
        strips = jnp.stack(
            [xs[:, :, i * wstrip:i * wstrip + wstrip + 2 * halo, :]
             for i in range(ns)], 1)
        strips = strips.reshape(B * ns, H, wstrip + 2 * halo, C)
        # each strip's local column 0 sits at global column
        # i*wstrip - halo; the kernel's global mask keeps past-the-edge
        # columns zero at every conv (true 'SAME' semantics)
        offs = jnp.tile(
            jnp.arange(ns, dtype=jnp.int32) * wstrip - halo, B)
        y = fused_resblocks_packed(
            strips, packed, res_scale=res_scale, band=band, chunk=chunk,
            g2=g2, dtype=dtype, wstrip=None, interpret=interpret,
            _col_off=offs, _w_glob=W)
        y = y.reshape(B, ns, H, wstrip + 2 * halo, C)
        y = y[:, :, :, halo:halo + wstrip, :]
        y = jnp.moveaxis(y, 1, 2).reshape(B, H, wpad, C)
        return y[:, :, :W, :]
    if _col_off is None:
        _col_off = jnp.zeros((B,), jnp.int32)
        _w_glob = W
    xp = None
    cur_nb = None
    for wg, bg, nb in packed:
        if nb != cur_nb:
            x = unpack_flat(xp, H, W, band, 2 * cur_nb, chunk) \
                if xp is not None else x.astype(dtype)
            xp = pack_flat(x, H, W, band, 2 * nb, chunk)
            cur_nb = nb
        xp = _trunk_call(xp, wg, bg, _col_off, nb, False, H, W, band,
                         chunk, g2, res_scale, _w_glob, interpret)
    return unpack_flat(xp, H, W, band, 2 * cur_nb, chunk)


def fused_resblocks(x, convs: Sequence[Tuple[Any, Any]], *,
                    res_scale: float = 1.0, fuse: int = 4,
                    band: int = 8192, chunk: int = 1024, g2: int = 2,
                    dtype: Any = jnp.bfloat16, interpret: bool = False):
    """Convenience wrapper: :func:`pack_trunk` + apply (see
    :func:`fused_resblocks_packed` for serving, where packing should be
    hoisted out of the hot path)."""
    packed = pack_trunk(convs, g2, fuse, dtype=dtype)
    return fused_resblocks_packed(x, packed, res_scale=res_scale,
                                  band=band, chunk=chunk, g2=g2,
                                  dtype=dtype, interpret=interpret)
