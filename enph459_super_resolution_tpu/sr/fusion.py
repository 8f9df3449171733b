"""Burst (multi-frame) fusion SR: registration, simulation, inference.

The reference's task is multi-frame SR from sub-pixel-shifted bursts
(``mono_barcodes/run_sr.py:212-240`` solves it classically with SAA + IBP).
This module is the *learned* counterpart's data path:

  * :func:`simulate_burst` — the same blur -> shift -> decimate forward
    model, but with **traced** shifts (every training batch draws fresh
    shift jitter and sensor noise without recompiling) and differentiable
    end to end.
  * :func:`register_burst` — align-then-fuse: bicubic-upsample each frame
    onto the HR grid and translate it by the known/nominal shifts.  The
    physics we know (registration) stays explicit; the network
    (:class:`~..models.zoo.BurstFusion`) learns only what classical IBP
    cannot express — joint deconvolution, denoising, and robustness to
    *residual misregistration* when the calibrated shifts are wrong.
  * :func:`fuse` — single-dispatch full-image inference.

``train.burst`` trains on this path and benchmarks against classical
SAA/IBP given the same nominal shifts under shift-calibration error and
sensor noise.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import conv2d_same, spline_zoom
from ..ops.resize import keys_phase_outputs, keys_shift2d

#: The reference's hardcoded 4-corner nominal shift pattern, LR px
#: (``mono_barcodes/run_sr.py:71-77``).
NOMINAL_SHIFTS_4 = ((0.5, 0.5), (0.5, -0.5), (-0.5, 0.5), (-0.5, -0.5))


def register_burst(lr_stack, shifts_yx, factor: int):
    """LR burst -> HR-grid registered stack.

    Args:
      lr_stack: ``f32[N, h, w]`` frames.
      shifts_yx: ``f32[N, 2]`` LR-pixel ``(dy, dx)`` shifts — may be traced
        (unlike :func:`~.classical.shift_and_add`, whose static shifts bake
        into FIR kernels).
      factor: integer upsample factor.

    Returns:
      ``f32[h*factor, w*factor, N]`` — each channel is one frame bicubic-
      upsampled and translated into registration (the per-frame terms of
      shift-and-add, kept separate for a network to fuse).
    """
    shifts_yx = jnp.asarray(shifts_yx, lr_stack.dtype)
    up = spline_zoom(lr_stack, factor)
    reg = jax.vmap(lambda f, s: keys_shift2d(f, s * factor))(up, shifts_yx)
    return jnp.moveaxis(reg, 0, -1)


def register_burst_phases(lr_stack, shifts_yx, factor: int):
    """LR burst -> polyphase registered stack, computed entirely at LR.

    ``f32[N, h, w]`` + ``f32[N, 2]`` (traced OK) ->
    ``f32[h, w, N * factor^2]``: each frame's Keys-cubic registered HR
    image packed as ``factor^2`` LR-grid phase channels (frame-major,
    phase channel order = ``pixel_shuffle`` layout — see
    ``ops.resize.keys_register_phases``).  The input contract of
    :class:`~..models.zoo.BurstFusionLR`; ~factor^2-x cheaper than
    :func:`register_burst` because nothing is materialized on the HR grid.
    """
    shifts_yx = jnp.asarray(shifts_yx, lr_stack.dtype)
    outs = []
    for n in range(lr_stack.shape[0]):  # N is static: unrolled, so ALL
        # N * f^2 planes interleave with ONE channels-last stack (no
        # leading-axis vmap + minor-dim transpose — round-4 chip A/B)
        outs.extend(keys_phase_outputs(lr_stack[n], shifts_yx[n], factor))
    return jnp.stack(outs, axis=-1)


#: model name -> registration function (the train/serve featurization
#: contract; recorded in each run's config.json as ``model``)
REGISTER_FNS = {
    "burstfusion": register_burst,
    "burstfusion_lr": register_burst_phases,
}


def _keys_phase_taps_np(d: float, factor: int):
    """Host twin of :func:`~..ops.resize._keys_phase_window` for a STATIC
    shift: ``(b0:int, w[factor, 5] f64)`` with
    ``out_p[i] = sum_j w[p, j] * lr[clip(i + b0 - 1 + j)]``."""
    from ..ops.resize import _keys_cubic

    us = [(p + 0.5) / factor - 0.5 - float(d) for p in range(factor)]
    b0 = int(np.floor(us[0]))
    w = np.stack([
        _keys_cubic(np.array([u - b0 - (j - 1) for j in range(5)]))
        for u in us])
    return b0, w


def build_register_phase_ops(shifts_yx, h: int, w: int, factor: int,
                             dtype_name: str = "float32"):
    """STATIC shifts -> banded registration operators, one
    ``(row_ops[factor], col_ops[factor])`` pair per frame.

    At serving a unit's shifts are config (the classical engine already
    bakes them into its banded operator set), so the Keys-cubic polyphase
    registration is itself a pair of 5-tap banded matrices per frame/axis
    — applied as block-decomposed MXU matmuls
    (:class:`~..ops.opmatrix.BandedOp`), the backend's fast primitive.
    The round-4 chip A/B measured every elementwise formulation of the
    traced registration at 25-50x off HBM roofline
    (scratch/probe_register_variants.py); this path reuses the classical
    engine's matmul machinery instead.  Entries match
    :func:`register_burst_phases` to f32 tolerance (same taps, matmul
    accumulation order).
    """
    from ..ops.opmatrix import BandedOp, band_from_kernel

    ops = []
    for s in np.asarray(shifts_yx, np.float64):
        by, wy = _keys_phase_taps_np(s[0], factor)
        bx, wx = _keys_phase_taps_np(s[1], factor)
        rows = tuple(
            BandedOp.from_banded(
                band_from_kernel(h, h, wy[p], by - 1, "nearest"),
                dtype_name=dtype_name)
            for p in range(factor))
        cols = tuple(
            BandedOp.from_banded(
                band_from_kernel(w, w, wx[p], bx - 1, "nearest"),
                dtype_name=dtype_name)
            for p in range(factor))
        ops.append((rows, cols))
    return tuple(ops)


def register_burst_phases_banded(lr_stack, reg_ops):
    """:func:`register_burst_phases` on prebuilt static-shift banded
    operators (:func:`build_register_phase_ops`) — jit-able with the ops
    riding as pytree arguments (their blocks are arrays, never baked-in
    constants)."""
    outs = []
    for n, (rows, cols) in enumerate(reg_ops):
        fr = lr_stack[n]
        for rop in rows:
            y = rop.row_apply(fr)
            for cop in cols:
                outs.append(cop.col_apply(y))
    return jnp.stack(outs, axis=-1)


def build_register_phase_conv(shifts_yx, factor: int):
    """STATIC shifts -> the whole polyphase registration as ONE small
    conv: kernel ``[KH, KW, N, N*factor^2]`` mapping the frame-channel
    stack to all frames' phase channels in one pass.

    The round-5 chip breakdown measured the 16-separable-apply banded
    registration at 191 ms of the 422 ms burst engine (~45%) at flagship
    geometry — the banded machinery is right for the classical solver's
    wide operators but wrong for sixteen 5-tap stencils.  Each frame's
    phase plane is a separable 5x5 (window-anchored) stencil on that
    frame alone, so the full registration is exactly a ``KH x KW`` conv
    from N in-channels (frames) to ``N * factor^2`` out-channels (phases,
    frame-major, :func:`~..ops.resize.keys_register_phases` layout) whose
    kernel is block-diagonal over frames — one MXU conv instead of 16
    banded matmuls + a 16-plane stack.

    Boundary: the Keys registration's 'nearest' index clamp IS
    edge-replicate padding, so :func:`register_burst_phases_conv` pads
    with ``mode='edge'`` and convolves VALID — exact at every pixel,
    including the image edges (parity with the banded path pinned in
    tests/test_burst_lr.py).

    Returns a :class:`RegisterConv` (a pytree: the kernel is a leaf, the
    pad widths are static aux data, so it rides through jit as an
    argument).
    """
    shifts = np.asarray(shifts_yx, np.float64)
    n = len(shifts)
    ff = factor * factor
    taps = [(_keys_phase_taps_np(s[0], factor),
             _keys_phase_taps_np(s[1], factor)) for s in shifts]
    lo_y = min(by - 1 for (by, _), _ in taps)
    hi_y = max(by + 3 for (by, _), _ in taps)
    lo_x = min(bx - 1 for _, (bx, _) in taps)
    hi_x = max(bx + 3 for _, (bx, _) in taps)
    kernel = np.zeros((hi_y - lo_y + 1, hi_x - lo_x + 1, n, n * ff),
                      np.float64)
    for i, ((by, wy), (bx, wx)) in enumerate(taps):
        for py in range(factor):
            for px in range(factor):
                out_c = i * ff + py * factor + px
                ky = by - 1 - lo_y
                kx = bx - 1 - lo_x
                kernel[ky:ky + 5, kx:kx + 5, i, out_c] = np.outer(
                    wy[py], wx[px])
    return RegisterConv(jnp.asarray(kernel.astype(np.float32)),
                        (-lo_y, hi_y), (-lo_x, hi_x))


@jax.tree_util.register_pytree_node_class
class RegisterConv:
    """Polyphase registration as one conv (see
    :func:`build_register_phase_conv`).  Calling it IS the registration:
    ``f32[N, h, w]`` or ``f32[B, N, h, w]`` -> ``f32[h, w, N*ff]`` /
    ``f32[B, h, w, N*ff]``."""

    def __init__(self, kernel, pads_y, pads_x):
        self.kernel = kernel
        self.pads_y = tuple(int(p) for p in pads_y)
        self.pads_x = tuple(int(p) for p in pads_x)

    def __call__(self, lr_stack):
        squeeze = lr_stack.ndim == 3
        if squeeze:
            lr_stack = lr_stack[None]
        x = jnp.moveaxis(lr_stack, 1, -1)  # (B, h, w, N)
        x = jnp.pad(x, ((0, 0), self.pads_y, self.pads_x, (0, 0)),
                    mode="edge")
        out = jax.lax.conv_general_dilated(
            x, jnp.asarray(self.kernel, x.dtype), window_strides=(1, 1),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out[0] if squeeze else out

    def tree_flatten(self):
        return (self.kernel,), (self.pads_y, self.pads_x)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(leaves[0], *aux)


def register_burst_phases_conv(lr_stack, reg_conv: "RegisterConv"):
    """:func:`register_burst_phases` via the one-conv path."""
    return reg_conv(lr_stack)


def simulate_burst(hr, shifts_yx, psf, factor: int,
                   noise_sigma=0.0, key=None):
    """HR scene -> LR burst via the classical forward model.

    blur (PSF) -> translate by ``shift * factor`` HR px (traced shifts) ->
    decimate ``[::factor]`` -> additive Gaussian read noise, clipped to the
    sensor's 0..255 range.  Matches :func:`~.classical.forward_model`
    frame-for-frame (Keys-cubic vs B-spline interpolation is the only
    difference; both are C1 cubic resamplers).
    """
    blurred = conv2d_same(hr, psf)
    shifts_yx = jnp.asarray(shifts_yx, hr.dtype)

    def one(s):
        sh = keys_shift2d(blurred, s * factor)
        return sh[..., ::factor, ::factor]

    lr = jax.vmap(one)(shifts_yx)
    if key is not None:
        lr = lr + noise_sigma * jax.random.normal(key, lr.shape, lr.dtype)
    return jnp.clip(lr, 0.0, 255.0)


def fuse(apply_fn, params, lr_stack, shifts_yx, factor: int,
         register=register_burst):
    """Full-image burst fusion: register, run the net, clip to range.

    ``register`` produces the net's input stack and must match the
    architecture the run was trained with (:data:`REGISTER_FNS`):
    ``register_burst`` for :class:`~..models.zoo.BurstFusion`
    (HR-grid stack ``[B, H, W, N]``), :func:`register_burst_phases` for
    :class:`~..models.zoo.BurstFusionLR` (polyphase ``[B, h, w, N*f^2]``).
    Either way the model returns ``sr[B, H, W, 1]``.
    """
    stack = register(lr_stack, shifts_yx, factor)
    sr = apply_fn(params, stack[None])[0, ..., 0]
    return jnp.clip(sr, 0.0, 255.0)


def data_consistency_refine(hr, lr_stack, shifts, psf, factor: int,
                            n_iter: int, step: float = 2.0,
                            clip=(0.0, 255.0)):
    """Landweber data-consistency iterations under the Keys-cubic forward
    model: ``hr += step * A^T(lr - A hr) / n_frames`` with the true
    adjoint ``A^T`` via ``jax.vjp``, clipped.  Shared by the product
    surface (``sr.run --fusion-refine``) and the eval harness
    (``train.burst --refine``); step 2.0 is spectrally stable (operator
    norm of blur+decimate < 1 — PERF_NOTES round-3 step study)."""

    def fwd(h):
        return jax.vmap(
            lambda s: simulate_burst(h, s[None], psf, factor)[0])(shifts)

    n = lr_stack.shape[0]

    def body(_, h):
        sim, vjp = jax.vjp(fwd, h)
        corr, = vjp(lr_stack - sim)
        return jnp.clip(h + step * corr / n, clip[0], clip[1])

    return jax.lax.fori_loop(0, n_iter, body, hr)


class FusionEngine:
    """The learned burst engine as a drop-in product surface.

    Wraps a trained ``train.burst`` run for the session pipeline
    (``sr.run --fusion-run <dir>``): one jitted graph registers the
    session's frames with its calibrated shifts (traced — every unit
    shares the compiled program regardless of its shift values), runs
    the net, and scores the result against the burst under the same
    blur -> shift -> decimate forward model the classical IBP minimizes,
    so ``metrics.json`` can report the learned and classical engines
    side by side.

    ``refine=N`` appends N data-consistency iterations seeded from the
    net's output (plug-and-play prior): Landweber steps
    ``hr += step * A^T(lr - A hr) / n_frames`` with the TRUE adjoint
    ``A^T``, clipped to [0, 255] — structurally the classical IBP update,
    so the refined output regains the classical engine's forward-model
    fit (which a feed-forward net trained on simulated bursts cannot
    match on a real sensor) while keeping the learned prior's detail.
    With the true adjoint the spectral bound allows steps well past IBP's
    0.5: measured on simulated bursts, step 2.0 reaches in 10 iterations
    the residual classical IBP(0.5) needs 40 for, monotone even at 4.0
    (the blur ⊕ decimate operator norm is < 1); 2.0 is the default.

    ``refine_engine='banded'`` (default) runs those iterations on the
    banded-MXU adjoint operator set
    (:func:`~.classical.landweber_refine`): a unit's shifts are static
    config at serving, so the operators bake into banded matmuls —
    measured ~3 ms/iteration at flagship size, ~150x the traced-shift
    ``jax.vjp`` formulation (0.47 s/iter, round-4 serving-path
    breakdown); with it, fusion + refine-30 undercuts classical IBP80's
    wall-clock.  Its forward model is the scipy-exact B-spline operator
    (the classical engine's own), so the reported ``forward_mse`` is
    directly comparable to the classical ``final_mse``.
    ``refine_engine='vjp'`` keeps the traced-shift Keys-cubic
    formulation (one compile shared across all shift values — for
    serving fleets with per-unit-varying shifts).

    ``dtype='bf16'`` serves the trunk at bfloat16 compute (params stay
    f32): ~2x conv throughput at <0.01 dB held-out PSNR cost — the trunk
    is a residual over the f32 SAA base, so bf16 rounding scales with the
    residual, not the signal (A/B in ``tests/test_burst.py`` and the
    robustness sweep).  Registration and refinement stay f32 either way.
    """

    def __init__(self, run_dir: str, psf=None, refine: int = 0,
                 refine_step: float = 2.0, dtype: str = "f32",
                 refine_engine: str = "banded",
                 static_register: bool = True):
        from ..train.burst import load_burst_run

        dtypes = {"f32": None, "float32": None,
                  "bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16}
        if dtype not in dtypes:
            raise ValueError(f"dtype must be f32 or bf16, got {dtype!r}")
        if refine_engine not in ("banded", "vjp"):
            raise ValueError(f"refine_engine must be 'banded' or 'vjp', "
                             f"got {refine_engine!r}")
        self.apply_fn, self.params, self.cfg = load_burst_run(
            run_dir, dtype=dtypes[dtype])
        self.register = REGISTER_FNS[self.cfg.get("model", "burstfusion")]
        self.run_dir = run_dir
        self.n_frames = int(self.cfg["frames"])
        self.factor = int(self.cfg["factor"])
        if refine < 0:
            raise ValueError(f"refine must be >= 0, got {refine}")
        self.refine = int(refine)
        self.refine_step = float(refine_step)
        self.refine_engine = refine_engine
        self._psf = psf
        # Both caches are bounded LRU (serving fleets with per-unit-varying
        # shifts/PSFs must not leak device-resident operators or compiled
        # fns): OrderedDict, move-to-end on hit, popitem(last=False) past
        # the cap.
        from collections import OrderedDict
        self._jitted = OrderedDict()  # psf bytes -> compiled fn
        self._jitted_cap = 4
        # serving shifts are static config -> the polyphase registration
        # bakes into ONE small conv per shift set (round 5; the traced
        # elementwise form measures 25-50x off roofline and the round-4
        # banded form cost 45% of the engine — PERF_NOTES).  Only the LR
        # (polyphase) arch has a static twin; RegisterConv caches per
        # shift set (shape-independent).
        self.static_register = (static_register and
                                self.register is register_burst_phases)
        self._reg_ops = OrderedDict()
        self._reg_ops_cap = 8

    def _compiled(self, psf: "np.ndarray"):
        import numpy as np

        psf = np.asarray(psf, np.float32)
        key = (psf.tobytes(), psf.shape)
        if key in self._jitted:
            self._jitted.move_to_end(key)
        else:
            while len(self._jitted) >= self._jitted_cap:
                self._jitted.popitem(last=False)
            def _run(params, lr_stack, shifts, reg_ops):
                if reg_ops is None:
                    stack = self.register(lr_stack, shifts, self.factor)
                elif isinstance(reg_ops, RegisterConv):
                    stack = reg_ops(lr_stack)
                else:  # legacy banded operator pytree
                    stack = register_burst_phases_banded(lr_stack, reg_ops)
                sr = self.apply_fn(params, stack[None])[0, ..., 0]
                sr = jnp.clip(sr, 0.0, 255.0)

                def fwd_mse(h):
                    sim = jax.vmap(
                        lambda s: simulate_burst(h, s[None], psf,
                                                 self.factor)[0])(shifts)
                    return jnp.mean((lr_stack - sim) ** 2)

                mse_raw = fwd_mse(sr)
                if self.refine > 0 and self.refine_engine == "vjp":
                    sr = data_consistency_refine(
                        sr, lr_stack, shifts, psf, self.factor,
                        self.refine, self.refine_step)
                return sr, fwd_mse(sr), mse_raw

            self._jitted[key] = jax.jit(_run)
        return self._jitted[key]

    def check(self, n_frames: int, factor: int) -> None:
        if (n_frames, factor) != (self.n_frames, self.factor):
            raise ValueError(
                f"fusion run {self.run_dir} was trained for "
                f"{self.n_frames} frames at x{self.factor}; workload has "
                f"{n_frames} frames at x{factor}")

    def __call__(self, lr_stack, shifts_yx, psf):
        """``f32[N, h, w]`` burst + N (dy, dx) shifts ->
        (sr, forward_mse, forward_mse_raw).

        ``forward_mse`` is the mean squared residual of re-imaging the
        (refined, when ``refine > 0``) estimate through the forward model
        — the same quantity the classical solver's ``final_mse`` reports.
        With the banded refine engine it IS the classical engine's
        scipy-exact forward operator (directly comparable numbers); the
        raw/vjp paths use the training-time Keys-cubic twin (equal to
        interpolant tolerance).  ``forward_mse_raw`` is the net's output
        before the data-consistency refinement (equal to ``forward_mse``
        at ``refine=0``).
        """
        lr_stack = jnp.asarray(lr_stack, jnp.float32)
        # only the frame count is knowable here; the workload factor must
        # be validated by the caller via check() (run.py / process_unit do)
        if int(lr_stack.shape[0]) != self.n_frames:
            raise ValueError(
                f"fusion run {self.run_dir} was trained for "
                f"{self.n_frames} frames; burst has {lr_stack.shape[0]}")
        shifts = jnp.asarray(shifts_yx, jnp.float32)
        psf_np = self._psf if psf is None else psf
        fn = self._compiled(psf_np)
        reg_ops = None
        if self.static_register:
            # one-conv registration (round 5): the banded 16-apply path
            # measured 191 ms of the 422 ms engine at flagship geometry;
            # the same stencils as one 4->16ch conv cost ~2 ms.  The
            # kernel depends only on the shifts, not the frame shape.
            s_np = np.asarray(shifts_yx, np.float64)
            rk = s_np.tobytes()
            if rk in self._reg_ops:
                self._reg_ops.move_to_end(rk)
            else:
                while len(self._reg_ops) >= self._reg_ops_cap:
                    self._reg_ops.popitem(last=False)
                self._reg_ops[rk] = build_register_phase_conv(
                    s_np, self.factor)
            reg_ops = self._reg_ops[rk]
        elif self.register is register_burst_phases:
            # traced polyphase path: the pad-6 dynamic_slice tap window
            # CLAMPS for |shift| > keys_phase_max_shift (3 LR px), silently
            # mis-registering — serving shifts are concrete, so reject here
            from ..ops.resize import keys_phase_max_shift

            bound = keys_phase_max_shift()
            worst = float(np.max(np.abs(np.asarray(shifts_yx, np.float64))))
            if worst > bound:
                raise ValueError(
                    f"|shift| {worst:.2f} LR px exceeds the traced "
                    f"registration's tap-window bound ({bound:.0f}); use "
                    f"static_register (banded ops, unbounded) for such "
                    f"units")
        sr, mse, mse_raw = fn(self.params, lr_stack, shifts, reg_ops)
        if self.refine > 0 and self.refine_engine == "banded":
            from .classical import landweber_refine

            sr, _, mse = landweber_refine(
                sr, lr_stack, psf_np,
                tuple(map(tuple, np.asarray(shifts_yx, np.float64))),
                factor=self.factor, n_iter=self.refine,
                step=self.refine_step)
        return sr, mse, mse_raw
