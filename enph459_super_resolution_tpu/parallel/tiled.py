"""Spatially-sharded (tiled) image processing with halo exchange.

The reference processes 12.6-Mpixel HR grids monolithically (SURVEY.md §5
"long-context" note); the TPU-native scaling axis is the image plane:
shard H (and optionally W) over mesh axes, exchange overlap halos between
neighbours with ``ppermute`` (pure ICI neighbour traffic), compute per
tile, keep interiors.

Consumers:
  * :func:`tiled_apply` — one-shot tiled inference for any shift-invariant
    local op (e.g. a conv-trunk SR model) whose receptive-field radius is
    known: exact, because the halo covers the receptive field.
  * :func:`sharded_ibp` — the classical IBP loop with a *per-iteration*
    halo refresh: one iteration's influence radius is bounded (PSF + spline
    kernels), so refreshing halos at the top of every iteration keeps every
    tile interior equal to the unsharded solve to float tolerance while the
    whole 50-80 iteration loop runs distributed.

Both accept a 1-D (rows) or 2-D (rows x columns) spatial mesh: pass
``sp_axis=("sp", "spw")`` to shard H over ``sp`` and W over ``spw``
(``sr.run --sp 4x2``).  2-D sharding keeps tiles square-ish as the device
count grows — at sp=8 the rgb workloads' 768-row LR leaves 96-row strips
against a 64-row halo (~67% overhead), while a 4x2 mesh's 192x512 tiles
cut halo traffic ~2.4x and W-heavy images shard past the row count.
Corner exchange falls out of sequencing the two 1-D exchanges: the W
exchange ships columns of the already-H-extended tile, so corner blocks
arrive via the lateral neighbour without explicit diagonal sends.

Boundary semantics: at the global image edges there is no neighbour.
For :func:`tiled_apply` halos there are edge-replicated or zero-filled per
``edge_mode``.  :func:`sharded_ibp` reproduces the unsharded solve's
boundary condition *exactly* (full-array allclose, no edge trim): each IBP
stage has its own boundary prior in the unsharded op chain — zero padding
for the PSF convolutions, SciPy-'nearest' extension of the *blurred* grid
for the forward shift, 'nearest' extension of the *zero-stuffed* error
grid (solid rows/columns, not an interleaved pattern) for the back-
projection shift — so the edge tiles patch their halo contents between
stages with ``jnp.where(axis_index == edge)`` fixups instead of using one
halo fill for the whole chain.  Patching H before W makes the corner halo
equal the replicated corner pixel — exactly SciPy's separable 'nearest'
extension.  The only remaining difference is the 'nearest' extension's
switch from edge-replication to symmetric reflection 25 samples past the
edge, whose influence re-enters through the spline prefilter's IIR tail at
|sqrt(3)-2|^25 ~ 1e-15 — below f32 epsilon.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import conv2d_same, correlate2d_same, spline_shift

SpAxes = Union[str, Sequence[str]]


def _sp_tuple(sp_axis: SpAxes) -> Tuple[str, ...]:
    axes = (sp_axis,) if isinstance(sp_axis, str) else tuple(sp_axis)
    if not 1 <= len(axes) <= 2:
        raise ValueError(f"sp_axis must name 1 or 2 mesh axes, got {axes}")
    return axes


def _edge_block(x, halo: int, axis: int, top: bool):
    """Edge-replicated halo block (global image boundary)."""
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, 1) if top else slice(x.shape[axis] - 1, x.shape[axis])
    edge = x[tuple(sl)]
    reps = [1] * x.ndim
    reps[axis] = halo
    return jnp.tile(edge, reps)


def halo_exchange(x, halo: int, axis_name: str, axis: int = 0,
                  edge_mode: str = "edge"):
    """Extend this device's tile with ``halo`` rows from each neighbour
    along ``axis``; global edges get edge-replicated rows (``edge_mode=
    'edge'``, SciPy-style boundary for the classical ops) or zeros
    (``'zero'``, matching SAME-conv semantics for NN trunks).

    (..., T, ...) -> (..., halo + T + halo, ...), two ppermutes.  For a
    2-D spatial mesh, call once per axis — the second exchange ships
    slices of the already-extended tile, which carries the corner blocks.
    """
    n = jax.lax.axis_size(axis_name)
    axis = axis % x.ndim
    if halo > x.shape[axis]:
        raise ValueError(
            f"halo ({halo}) exceeds tile extent ({x.shape[axis]}) along the "
            f"sharded axis; use fewer devices or a larger image")
    sl_lo = [slice(None)] * x.ndim
    sl_lo[axis] = slice(0, halo)
    sl_hi = [slice(None)] * x.ndim
    sl_hi[axis] = slice(x.shape[axis] - halo, x.shape[axis])

    # my top rows -> previous device's bottom halo; my bottom rows -> next's top
    perm_up = [(i, (i - 1) % n) for i in range(n)]
    perm_dn = [(i, (i + 1) % n) for i in range(n)]
    from_next = jax.lax.ppermute(x[tuple(sl_lo)], axis_name, perm_up)
    from_prev = jax.lax.ppermute(x[tuple(sl_hi)], axis_name, perm_dn)

    idx = jax.lax.axis_index(axis_name)
    if edge_mode == "zero":
        top_blk = jnp.zeros_like(from_prev)
        bot_blk = jnp.zeros_like(from_next)
    else:
        top_blk = _edge_block(x, halo, axis, top=True)
        bot_blk = _edge_block(x, halo, axis, top=False)
    from_prev = jnp.where(idx == 0, top_blk, from_prev)
    from_next = jnp.where(idx == n - 1, bot_blk, from_next)
    return jnp.concatenate([from_prev, x, from_next], axis=axis)


def tiled_apply(fn: Callable, img, mesh: Mesh, halo: int,
                sp_axis: SpAxes = "sp", axis=-2, out_scale: int = 1,
                edge_mode: str = "edge"):
    """Apply a local op to a spatially-sharded image, exactly.

    Args:
      fn: shift-invariant local function (tile -> tile, same leading dims);
        receptive-field radius must be <= ``halo``.  If it upsamples by
        ``out_scale``, output tiles are ``T * out_scale`` tall.
      img: full image (..., H, W); sharded dims divisible by their axis.
      mesh: mesh holding the ``sp_axis`` axes.
      halo: overlap in *input* pixels (same for both axes when 2-D).
      sp_axis: one mesh-axis name (shard ``axis``) or two (shard ``axis``
        and ``axis + 1`` — H x W tiling with corner exchange).
      axis: the (first) spatial dim of ``img``.

    Returns the full output, interiors stitched (still sharded on device).
    """
    sp_axes = _sp_tuple(sp_axis)
    ndim = img.ndim
    ax0 = axis % ndim
    axes_n = tuple(ax0 + k for k in range(len(sp_axes)))
    for a, name in zip(axes_n, sp_axes):
        nsp = mesh.shape[name]
        if img.shape[a] % nsp != 0:
            raise ValueError(
                f"dim {a} ({img.shape[a]}) not divisible by {name}={nsp}")

    def shard_fn(tile):
        ext = tile
        for a, name in zip(axes_n, sp_axes):
            ext = halo_exchange(ext, halo, name, a, edge_mode)
        out = fn(ext)
        s = out_scale
        sl = [slice(None)] * out.ndim
        for a in axes_n:
            sl[a] = slice(halo * s, halo * s + tile.shape[a] * s)
        return out[tuple(sl)]

    spec_list = [None] * ndim
    for a, name in zip(axes_n, sp_axes):
        spec_list[a] = name
    spec = P(*spec_list)

    mapped = jax.shard_map(shard_fn, mesh=mesh, in_specs=(spec,),
                           out_specs=spec)
    img = jax.device_put(img, NamedSharding(mesh, spec))
    return jax.jit(mapped)(img)


def _patch_halos(x, halo: int, idx, nsp: int, top_blk, bot_blk,
                 axis: int = 0):
    """Replace the outer ``halo`` slices along ``axis`` with the given
    blocks, but only on the devices holding a global edge (``idx == 0`` /
    ``idx == nsp - 1``).  Interior devices keep their exchanged neighbour
    slices untouched."""
    sl_tail = [slice(None)] * x.ndim
    sl_tail[axis] = slice(halo, None)
    top_fixed = jnp.concatenate([top_blk, x[tuple(sl_tail)]], axis=axis)
    x = jnp.where(idx == 0, top_fixed, x)
    sl_head = [slice(None)] * x.ndim
    sl_head[axis] = slice(0, x.shape[axis] - halo)
    bot_fixed = jnp.concatenate([x[tuple(sl_head)], bot_blk], axis=axis)
    return jnp.where(idx == nsp - 1, bot_fixed, x)


def _rep_slice(x, pos: int, halo: int, axis: int = 0):
    """``halo`` copies of slice ``pos`` along ``axis`` — SciPy-'nearest'
    edge extension."""
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(pos, pos + 1)
    reps = [1] * x.ndim
    reps[axis] = halo
    return jnp.tile(x[tuple(sl)], reps)


def sharded_ibp(lr_stack, hr_init, psf: np.ndarray, shifts_yx, mesh: Mesh,
                factor: int = 2, n_iter: int = 80, step: float = 0.5,
                halo_lr: int = 32, sp_axis: SpAxes = "sp",
                clip=(0.0, 255.0), solver: str = "ibp"):
    """Classical IBP with the image plane sharded over ``sp_axis``.

    Per iteration and per device: refresh the HR tile's halo from its
    neighbours (2 ppermutes of ``halo_lr * factor`` rows over ICI per
    sharded axis), run one IBP update on the extended tile, keep the
    interior.  One iteration's support radius (7x7 PSF + ~19-tap
    spline-phase kernels, twice) is well under ``halo_lr * factor``, so
    interiors match the unsharded solve to float tolerance.  The monitored
    MSE is computed over interiors only and ``pmean``-reduced, matching
    the unsharded per-iteration MSE.

    ``sp_axis`` may name one mesh axis (H strips — the 1-D layout) or two
    (``("sp", "spw")``: H x W tiles with corner exchange, keeping tiles
    square-ish past 8 devices — see module docstring).

    Global-edge exactness: the unsharded iteration
    (``mono_barcodes/run_sr.py:221-240`` semantics) applies a different
    boundary prior at each stage — zero padding for both PSF convolutions,
    'nearest' extension of the *blurred* grid before the forward shift, and
    'nearest' extension of the *zero-stuffed* error grid (solid replicated
    rows/columns — NOT the interleaved stuff-after-extend pattern) before
    the back-projection shift.  The edge tiles therefore patch their halo
    slices between stages (:func:`_patch_halos`): zeros before the blur,
    the replicated true edge slice of the blurred grid before the forward
    shift, the replicated true edge slice of the stuffed grid before the
    backward shift, and zeros again before the final correlation; patching
    H before W realizes SciPy's separable 'nearest' corner semantics.
    Result: the sharded solve matches the single-device solve over the
    FULL array (``tests/test_parallel.py`` asserts allclose with no edge
    trim, 1-D and 2-D).

    ``solver='adjoint'`` replaces the heuristic back-projection with the
    TRUE adjoint of the per-tile patched forward via ``jax.vjp`` (step
    ~2.0 stable — see ``sr.classical._solver_mode``).  Locality argument:
    an interior HR pixel's adjoint row draws only on LR samples within the
    operator support (≪ halo), all present in the extended tile, and each
    HR pixel is owned by exactly one device's interior — so keeping the
    interior of the local vjp equals the global adjoint, including the
    global edges (the vjp transposes the same halo patches the forward
    applies).

    Args:
      lr_stack: (N, h, w) registered LR frames.
      hr_init: (h*factor, w*factor) seed (e.g. SAA output).

    Returns (hr, mse_history); hr sharded over the mesh.
    """
    shifts_key = tuple((float(a), float(b)) for a, b in shifts_yx)
    psf = np.asarray(psf, dtype=np.float64)
    sp_axes = _sp_tuple(sp_axis)
    ks = range(len(sp_axes))
    nsp = [mesh.shape[a] for a in sp_axes]
    n_frames = lr_stack.shape[-3]
    for k in ks:
        dim = lr_stack.shape[-2 + k]
        if dim % nsp[k] != 0:
            raise ValueError(
                f"LR dim {dim} not divisible by {sp_axes[k]}={nsp[k]}")
    halo_hr = halo_lr * factor

    def shard_fn(lr_tile, hr_tile):
        lr_ext = lr_tile
        for k in ks:
            lr_ext = halo_exchange(lr_ext, halo_lr, sp_axes[k], 1 + k)
        idxs = [jax.lax.axis_index(a) for a in sp_axes]
        t_lr = [lr_tile.shape[1 + k] for k in ks]
        t_hr = [hr_tile.shape[k] for k in ks]

        def nearest_patch(x):
            # replicated true-edge slices, H before W: the W pass copies
            # the already-patched rows, making the corner halo the
            # replicated corner pixel (SciPy separable 'nearest')
            for k in ks:
                x = _patch_halos(
                    x, halo_hr, idxs[k], nsp[k],
                    _rep_slice(x, halo_hr, halo_hr, k),
                    _rep_slice(x, halo_hr + t_hr[k] - 1, halo_hr, k),
                    axis=k)
            return x

        def zero_patch(x, halo: int):
            for k in ks:
                shape = list(x.shape)
                shape[k] = halo
                z = jnp.zeros(shape, x.dtype)
                x = _patch_halos(x, halo, idxs[k], nsp[k], z, z, axis=k)
            return x

        def interior(x, halo: int, ext):
            sl = [slice(None)] * x.ndim
            for k in ks:
                sl[k] = slice(halo, halo + ext[k])
            return x[tuple(sl)]

        def body(it, carry):
            hr_int, errs = carry
            # zero edge halos: the PSF blur's boundary prior is zero padding
            hr_ext = hr_int
            for k in ks:
                hr_ext = halo_exchange(hr_ext, halo_hr, sp_axes[k], k,
                                       edge_mode="zero")
            correction = jnp.zeros_like(hr_int)
            mse = jnp.asarray(0.0, dtype=hr_ext.dtype)
            for i in range(n_frames):
                dy, dx = shifts_key[i]

                def fwd_frame(hr_ext_):
                    blurred = conv2d_same(hr_ext_, psf)
                    # forward shift sees the 'nearest' extension of the
                    # blurred grid: replicate its true edge slices into
                    # the edge halos
                    blurred = nearest_patch(blurred)
                    return spline_shift(blurred, (dy * factor, dx * factor),
                                        strides=(factor, factor))

                if solver == "adjoint":
                    sim, vjp = jax.vjp(fwd_frame, hr_ext)
                    err = lr_ext[i] - sim
                    # the vjp seed must cover only LR samples that exist
                    # globally: at the global edges the extended tile's
                    # halo slices are phantoms (beyond the sensor), and
                    # the edge-replication patch would pull their junk
                    # error into the edge pixels' adjoint rows
                    seed = zero_patch(err, halo_lr)
                    corr_ext, = vjp(seed)
                    corr = corr_ext
                else:
                    sim = fwd_frame(hr_ext)
                    err = lr_ext[i] - sim
                mse = mse + jnp.mean(jnp.square(interior(err, halo_lr,
                                                         t_lr)))
                if solver != "adjoint":
                    # heuristic back-projection: zero-stuff the extended
                    # error grid, then give the backward shift the
                    # 'nearest' extension of the STUFFED grid — solid
                    # replicated slices at the global edges
                    up = jnp.zeros(hr_ext.shape, dtype=err.dtype)
                    up = up.at[::factor, ::factor].set(err)
                    up = nearest_patch(up)
                    shifted = spline_shift(up, (-dy * factor, -dx * factor))
                    # the final correlation's boundary prior is zero padding
                    shifted = zero_patch(shifted, halo_hr)
                    corr = correlate2d_same(shifted, psf)
                correction = correction + interior(corr, halo_hr, t_hr)
            hr_int = jnp.clip(hr_int + step * correction / n_frames,
                              clip[0], clip[1])
            errs = errs.at[it].set(jax.lax.pmean(mse / n_frames, sp_axes))
            return hr_int, errs

        errs0 = jnp.zeros((n_iter,), dtype=hr_tile.dtype)
        return jax.lax.fori_loop(0, n_iter, body, (hr_tile, errs0))

    lr_spec = [None, sp_axes[0], None]
    hr_spec = [sp_axes[0], None]
    if len(sp_axes) > 1:
        lr_spec[2] = sp_axes[1]
        hr_spec[1] = sp_axes[1]
    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(*lr_spec), P(*hr_spec)),
        out_specs=(P(*hr_spec), P()))

    lr_stack = jax.device_put(jnp.asarray(lr_stack),
                              NamedSharding(mesh, P(*lr_spec)))
    hr_init = jax.device_put(jnp.asarray(hr_init),
                             NamedSharding(mesh, P(*hr_spec)))
    return jax.jit(mapped)(lr_stack, hr_init)


def solve_sharded(lr_stack, psf, shifts_yx, mesh: Mesh,
                  factor: int = 2, n_iter: int = 80, step: float = 0.5,
                  halo_lr: int = 32, sp_axis: SpAxes = "sp",
                  solver: str = "ibp"):
    """Full classical solve with the IBP loop spatially sharded.

    Native-2x and SAA are global resampling ops (their endpoint-aligned
    zoom grid is not translation-invariant, see ``ops.resample``), so they
    run unsharded — they are two cheap passes; the 50-80x iterated IBP is
    where the compute lives and runs via :func:`sharded_ibp`.

    Returns the same dict as ``sr.classical.solve``.
    """
    from ..sr.classical import native_upsample
    from ..sr.classical import shift_and_add as saa_fn

    shifts_key = tuple((float(a), float(b)) for a, b in shifts_yx)
    lr_stack = jnp.asarray(lr_stack)
    lr_mean = jnp.mean(lr_stack, axis=0)
    native = native_upsample(lr_mean, factor)
    saa = saa_fn(lr_stack, shifts_key, factor)
    hr, errs = sharded_ibp(lr_stack, saa, psf, shifts_key, mesh,
                           factor=factor, n_iter=n_iter, step=step,
                           halo_lr=halo_lr, sp_axis=sp_axis, solver=solver)
    return {
        "lr_mean": lr_mean,
        "native": native,
        "saa": saa,
        "ibp": hr,
        "mse_history": errs,
    }
