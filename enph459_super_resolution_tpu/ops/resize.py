"""Keys-cubic image resize with antialiasing (MATLAB ``imresize`` protocol).

The SR literature's bicubic degradation (Set5/Set14/DIV2K "LR = bicubic(HR,
1/s)") is MATLAB imresize semantics: Keys cubic kernel (a = -0.5), kernel
*widened by the scale factor* when downsampling (antialiasing), symmetric
edge handling, weights renormalized per output pixel.  This differs from
scipy's spline zoom (ops.resample.spline_zoom) — both are provided; this
one defines the neural-SR data pipeline and eval protocol.

Implementation: banded matrices applied as MXU matmuls (see ops.opmatrix
for why that is the fast primitive on this hardware).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _keys_cubic(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    return np.where(
        ax <= 1, (a + 2) * ax3 - (a + 3) * ax2 + 1,
        np.where(ax < 2, a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a, 0.0))


@functools.lru_cache(maxsize=None)
def resize_matrix(n_in: int, n_out: int, antialias: bool = True,
                  dtype_name: str = "float32") -> np.ndarray:
    """(n_out, n_in) MATLAB-imresize-compatible cubic resize matrix."""
    scale = n_out / n_in
    # output pixel centres mapped to input coordinates (pixel-centre grid)
    u = (np.arange(n_out, dtype=np.float64) + 0.5) / scale - 0.5
    if scale < 1.0 and antialias:
        kwidth = 4.0 / scale
        kscale = scale
    else:
        kwidth = 4.0
        kscale = 1.0
    left = np.floor(u - kwidth / 2).astype(np.int64)
    p = int(math.ceil(kwidth)) + 2
    idx = left[:, None] + np.arange(p)[None, :]
    w = _keys_cubic((u[:, None] - idx) * kscale) * kscale
    w = w / np.maximum(w.sum(axis=1, keepdims=True), 1e-12)
    # symmetric edge handling
    idx_c = np.clip(idx, 0, n_in - 1)
    m = 2 * n_in
    idx_r = idx % m
    idx_r = np.where(idx_r < 0, idx_r + m, idx_r)
    idx_r = np.where(idx_r >= n_in, m - 1 - idx_r, idx_r)
    del idx_c
    mtx = np.zeros((n_out, n_in), dtype=np.float64)
    rows = np.repeat(np.arange(n_out), p)
    np.add.at(mtx, (rows, idx_r.ravel()), w.ravel())
    return mtx.astype(np.dtype(dtype_name))


def resize(img, out_shape, antialias: bool = True):
    """Cubic resize of the trailing-2 spatial axes of (..., H, W[, C]).

    NHWC-aware: a trailing channel axis of size 1/3/4 is preserved.
    """
    has_c = img.ndim >= 3 and img.shape[-1] in (1, 3, 4)
    h_ax = img.ndim - (3 if has_c else 2)
    w_ax = h_ax + 1
    h_out, w_out = out_shape
    dtype_name = str(img.dtype)
    mr = jnp.asarray(resize_matrix(img.shape[h_ax], h_out, antialias,
                                   dtype_name), img.dtype)
    mc = jnp.asarray(resize_matrix(img.shape[w_ax], w_out, antialias,
                                   dtype_name), img.dtype)
    img = jnp.moveaxis(img, (h_ax, w_ax), (-2, -1)) if has_c else img
    out = jnp.einsum("oh,...hw->...ow", mr, img,
                     precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("...hw,ow->...ho", out, mc,
                     precision=jax.lax.Precision.HIGHEST)
    if has_c:
        out = jnp.moveaxis(out, (-2, -1), (h_ax, w_ax))
    return out


def bicubic_degrade(hr, scale: int, antialias: bool = True):
    """HR -> LR by 1/scale cubic downsampling (the SR-paper protocol)."""
    has_c = hr.ndim >= 3 and hr.shape[-1] in (1, 3, 4)
    h_ax = hr.ndim - (3 if has_c else 2)
    h, w = hr.shape[h_ax], hr.shape[h_ax + 1]
    if h % scale or w % scale:
        raise ValueError(f"HR dims ({h},{w}) not divisible by scale {scale}")
    return resize(hr, (h // scale, w // scale), antialias)


def bicubic_upsample(lr, scale: int):
    """LR -> HR cubic upsampling (no antialias on upsample)."""
    has_c = lr.ndim >= 3 and lr.shape[-1] in (1, 3, 4)
    h_ax = lr.ndim - (3 if has_c else 2)
    h, w = lr.shape[h_ax], lr.shape[h_ax + 1]
    return resize(lr, (h * scale, w * scale))


# ---------------------------------------------------------------------------
# traced-shift Keys-cubic sampling (burst simulation / registration)
# ---------------------------------------------------------------------------
#
# The scipy-parity resamplers in ops.resample bake the sub-pixel shift into
# FIR kernels at *trace time* (static shifts: one compiled program per shift
# set — right for the classical workloads, whose shifts are config).  Burst
# fusion training draws fresh random shifts every batch, so the shift must
# be a *traced* value: these samplers compute the 4 Keys-cubic tap weights
# from the traced fractional part and gather the taps with dynamic slices
# (whose clamping, on an edge-padded array, realizes 'nearest' boundaries).

def _keys_cubic_jnp(x, a: float = -0.5):
    ax = jnp.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    return jnp.where(
        ax <= 1, (a + 2) * ax3 - (a + 3) * ax2 + 1,
        jnp.where(ax < 2, a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a, 0.0))


def _keys_shift_axis(x, shift, axis: int, pad: int):
    """Shift (..., n, ...) along ``axis`` by a traced scalar ``shift``
    (out[i] = in[i - shift], Keys cubic, nearest boundary), |shift| <= pad-2."""
    n = x.shape[axis]
    u = -shift  # sample coordinate offset: out[i] samples in[i + u]
    m = jnp.floor(u)
    f = u - m  # fractional part in [0, 1)
    base = m.astype(jnp.int32) + (pad - 1)  # first tap index in padded array
    pad_widths = [(0, 0)] * x.ndim
    pad_widths[axis] = (pad, pad)
    xp = jnp.pad(x, pad_widths, mode="edge")
    # 4 taps at offsets -1, 0, +1, +2 around floor(u); dynamic_slice clamps
    # out-of-range starts, which on the edge-padded array extends 'nearest'
    out = None
    for j in range(4):
        w = _keys_cubic_jnp(f - (j - 1)).astype(x.dtype)
        tap = jax.lax.dynamic_slice_in_dim(xp, base + j, n, axis=axis)
        out = tap * w if out is None else out + tap * w
    return out


def _keys_phase_window(d, factor: int, pad: int):
    """Traced fractional offset ``d`` -> shared 5-tap window for all
    ``factor`` phases along one axis: ``(base_i32, [w5 x factor])`` with
    ``out_p[i] = sum_j w5_p[j] * xp[i + base + j]`` on a ``pad``-edge-padded
    axis.  The window is anchored at ``floor(us[0])`` (us sorted ascending,
    ``us[-1] - us[0] < 1`` — the polyphase property), so one set of 5 tap
    slices serves every phase."""
    us = [(p + 0.5) / factor - 0.5 - d for p in range(factor)]
    b0 = jnp.floor(us[0])
    base = b0.astype(jnp.int32) + (pad - 1)
    ws = [jnp.stack([_keys_cubic_jnp(u - b0 - (j - 1)) for j in range(5)])
          for u in us]
    return base, ws


def keys_phase_max_shift(pad: int = 6) -> float:
    """Largest |shift| (LR px, per axis) the ``pad``-edge-padded
    ``dynamic_slice`` tap window of :func:`keys_phase_outputs` supports
    without clamping.  ``dynamic_slice`` CLAMPS out-of-range starts, so a
    shift beyond this bound silently mis-registers on the traced path
    (the banded static path, 'nearest' extension baked into matrix
    entries, is unbounded) — callers with concrete shifts must validate
    (``sr.fusion.FusionEngine`` does)."""
    return float(pad - 3)


def keys_phase_outputs(lr, shift_yx, factor: int, pad: int = 6):
    """The ``factor**2`` polyphase planes of :func:`keys_register_phases`
    as a plain list of ``(..., h, w)`` arrays in ``p_y * factor + p_x``
    order.  Shifts are traced; |shift| per axis must stay within
    :func:`keys_phase_max_shift` (``pad - 3`` LR px) or the clamped tap
    window silently mis-registers.  Kept un-stacked so multi-frame callers
    (:func:`~..sr.fusion.register_burst_phases`) can interleave ALL
    frames' planes with ONE channels-last stack — the round-4 chip
    breakdown measured the leading-axis einsum + two minor-dim transposes
    of the previous formulation at 1.6x the cost of this weighted-tap-sum
    form, and the einsum's TPU dot ran at DEFAULT (bf16-operand)
    precision; the elementwise form is exact f32
    (scratch/probe_register_variants.py)."""
    dy, dx = shift_yx[0], shift_yx[1]
    ny, nx = lr.shape[-2], lr.shape[-1]
    pad_widths = [(0, 0)] * (lr.ndim - 2) + [(pad, pad), (pad, pad)]
    xp = jnp.pad(lr, pad_widths, mode="edge")
    by, wys = _keys_phase_window(dy, factor, pad)
    bx, wxs = _keys_phase_window(dx, factor, pad)
    taps = [jax.lax.dynamic_slice_in_dim(xp, by + j, ny, axis=lr.ndim - 2)
            for j in range(5)]
    outs = []
    for wy in wys:
        wy = wy.astype(lr.dtype)
        row = sum(wy[j] * taps[j] for j in range(5))  # (..., ny, nx+2p)
        cols = [jax.lax.dynamic_slice_in_dim(row, bx + k, nx,
                                             axis=lr.ndim - 1)
                for k in range(5)]
        for wx in wxs:
            wx = wx.astype(lr.dtype)
            outs.append(sum(wx[k] * cols[k] for k in range(5)))
    return outs


def keys_register_phases(lr, shift_yx, factor: int, pad: int = 6):
    """Registered HR-grid resample of one LR frame, computed ENTIRELY at LR
    resolution as ``factor**2`` polyphase planes.

    The registered HR image is ``reg[i] = Interp_lr((i + 0.5)/factor - 0.5
    - shift)`` (Keys cubic a = -0.5, pixel-centre coordinate mapping — the
    imresize upsample convention of :func:`resize_matrix` — composed with a
    translation by ``shift`` LR px; nearest boundary).  Writing ``i =
    factor*y + p`` splits it into ``factor`` phases per axis, each a 4-tap
    FIR **on the LR grid** with a traced fractional offset — so the whole
    registration costs O(taps x LR pixels), ~``factor**2`` x cheaper in
    compute AND HBM traffic than materializing the upsampled grid and
    shifting it (the round-3 ``register_burst`` path; the serving-path
    breakdown measured that at 1/3 of the burst-fusion engine's time).

    Returns ``(h, w, factor*factor)`` with the phase channel ordered
    ``p_y * factor + p_x`` — exactly :func:`~..models.common.pixel_shuffle`
    layout, so ``pixel_shuffle(phases, factor)`` IS the registered HR
    image (``phases_to_hr``).  Shifts may be traced (per-batch jitter in
    burst training draws them fresh without recompiles).
    """
    return jnp.stack(keys_phase_outputs(lr, shift_yx, factor, pad),
                     axis=-1)


def phases_to_hr(phases, factor: int):
    """(..., h, w, f*f) polyphase planes -> (..., h*f, w*f) HR image."""
    from ..models.common import pixel_shuffle

    return pixel_shuffle(phases, factor)[..., 0]


def keys_shift2d(x, shift_yx, pad: int = 8):
    """Sub-pixel translate the trailing-2 axes of ``x`` by a *traced*
    ``(dy, dx)``: ``out[y, x] = in[y - dy, x - dx]`` (matching
    ``ops.resample.spline_shift`` sign conventions), Keys-cubic (a = -0.5)
    interpolation, nearest-edge boundary.  |dy|, |dx| must be <= pad - 2.

    Use for burst simulation and frame registration where shifts are data
    (drawn per training batch); for the classical solver's static config
    shifts, the scipy-exact :func:`~..ops.resample.spline_shift` applies.
    """
    dy, dx = shift_yx[0], shift_yx[1]
    x = _keys_shift_axis(x, dy, x.ndim - 2, pad)
    return _keys_shift_axis(x, dx, x.ndim - 1, pad)
