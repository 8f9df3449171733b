"""Neural SR model zoo — the BASELINE.json north-star families.

All models: NHWC, ``f(lr[B,h,w,C]) -> hr[B,h*s,w*s,C]``, float32 params with
configurable compute dtype (bfloat16 trunks keep the MXU at full rate).

Families (architectures per the original papers, config names per
BASELINE.json):
  * SRCNN   — Dong et al. 2014, 9-5-5 on a bicubic-upsampled input.
  * ESPCN   — Shi et al. 2016, 5-3-3 + sub-pixel shuffle head.
  * FSRCNN  — Dong et al. 2016, feature/shrink/map/expand + transposed conv.
  * EDSR    — Lim et al. 2017 baseline: 16 resblocks x 64 feats, no BN.
  * RRDBNet — ESRGAN generator (Wang et al. 2018): 23 RRDB blocks.
  * VGGStyleDiscriminator — for the ESRGAN GAN fine-tune stage.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import MeanShift, ResBlock, Upsampler, pixel_shuffle


class SRCNN(nn.Module):
    """9-5-5 conv net on a pre-upsampled (bicubic) input; scale handled by
    the data pipeline, so __call__ maps (B,H,W,C)->(B,H,W,C)."""

    channels: int = 1
    f1: int = 64
    f2: int = 32
    rgb_range: float = 255.0  # inputs are 0..range; net runs on 0..1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = (x / self.rgb_range).astype(self.dtype)
        x = nn.relu(nn.Conv(self.f1, (9, 9), dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(self.f2, (5, 5), dtype=self.dtype)(x))
        x = nn.Conv(self.channels, (5, 5), dtype=self.dtype)(x)
        return x.astype(jnp.float32) * self.rgb_range


class ESPCN(nn.Module):
    """Efficient sub-pixel CNN: small trunk at LR resolution, r^2-channel
    conv + pixel shuffle at the end (all FLOPs stay on the LR grid)."""

    scale: int = 4
    channels: int = 1
    rgb_range: float = 255.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = (x / self.rgb_range).astype(self.dtype)
        x = nn.tanh(nn.Conv(64, (5, 5), dtype=self.dtype)(x))
        x = nn.tanh(nn.Conv(32, (3, 3), dtype=self.dtype)(x))
        x = nn.Conv(self.channels * self.scale ** 2, (3, 3),
                    dtype=self.dtype)(x)
        return pixel_shuffle(x, self.scale).astype(jnp.float32) * \
            self.rgb_range


class FSRCNN(nn.Module):
    """Feature(5x5,d) -> shrink(1x1,s) -> m x map(3x3,s) -> expand(1x1,d)
    -> sub-pixel upsample.

    The original uses a 9x9 transposed conv; on TPU a conv + pixel-shuffle
    head is mathematically equivalent capacity at a fraction of the cost
    (transposed convs lower poorly), so the deconv is realized as
    conv(C*r^2) + depth_to_space.
    """

    scale: int = 4
    channels: int = 1
    d: int = 56
    s: int = 12
    m: int = 4
    rgb_range: float = 255.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = (x / self.rgb_range).astype(self.dtype)
        prelu = functools.partial(nn.PReLU, param_dtype=jnp.float32)
        x = nn.Conv(self.d, (5, 5), dtype=self.dtype)(x)
        x = prelu()(x)
        x = nn.Conv(self.s, (1, 1), dtype=self.dtype)(x)
        x = prelu()(x)
        for _ in range(self.m):
            x = nn.Conv(self.s, (3, 3), dtype=self.dtype)(x)
            x = prelu()(x)
        x = nn.Conv(self.d, (1, 1), dtype=self.dtype)(x)
        x = prelu()(x)
        x = nn.Conv(self.channels * self.scale ** 2, (9, 9),
                    dtype=self.dtype)(x)
        return pixel_shuffle(x, self.scale).astype(jnp.float32) * \
            self.rgb_range


class _TrunkBody(nn.Module):
    """nn.scan body for the stacked EDSR trunk (one resblock per slice)."""

    features: int
    res_scale: float
    dtype: Any

    @nn.compact
    def __call__(self, x, _):
        return ResBlock(self.features, self.res_scale,
                        dtype=self.dtype)(x), None


class EDSR(nn.Module):
    """EDSR-baseline: 16 residual blocks, 64 features, res_scale 1.0
    (paper-large would be 32 x 256 with res_scale 0.1).

    ``scan_trunk=True`` switches the trunk to an ``nn.scan`` over one
    shared ResBlock definition, stacking the per-block params on a leading
    ``[n_resblocks, ...]`` axis — mathematically identical forward, but the
    stacked layout is what pipeline parallelism shards over a ``pp`` mesh
    axis (parallel/pipeline.py::make_pipelined_edsr_apply).  Named
    submodules (head/trunk/tail_conv/upsampler/out_conv) make the subtrees
    addressable; checkpoints are NOT interchangeable with the default
    unrolled layout.
    """

    scale: int = 4
    channels: int = 3
    n_resblocks: int = 16
    n_feats: int = 64
    res_scale: float = 1.0
    rgb_range: float = 255.0
    remat: bool = False  # jax.checkpoint each resblock: trades ~30% extra
    # FLOPs for O(1) trunk activation memory in training (HBM headroom)
    scan_trunk: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = MeanShift(sign=-1, scale=self.rgb_range)(x)
        x = x.astype(self.dtype)
        if self.scan_trunk:
            x = head = nn.Conv(self.n_feats, (3, 3), dtype=self.dtype,
                               name="head")(x)
            body = nn.remat(_TrunkBody) if self.remat else _TrunkBody
            trunk = nn.scan(body, variable_axes={"params": 0},
                            split_rngs={"params": True},
                            length=self.n_resblocks)(
                self.n_feats, self.res_scale, self.dtype, name="trunk")
            x, _ = trunk(x, None)
            x = nn.Conv(self.n_feats, (3, 3), dtype=self.dtype,
                        name="tail_conv")(x)
            x = x + head
            x = Upsampler(self.scale, self.n_feats, dtype=self.dtype,
                          name="upsampler")(x)
            x = nn.Conv(self.channels, (3, 3), dtype=self.dtype,
                        name="out_conv")(x)
        else:
            x = head = nn.Conv(self.n_feats, (3, 3), dtype=self.dtype)(x)
            block = ResBlock
            if self.remat:
                block = nn.remat(ResBlock)
            for _ in range(self.n_resblocks):
                x = block(self.n_feats, self.res_scale, dtype=self.dtype)(x)
            x = nn.Conv(self.n_feats, (3, 3), dtype=self.dtype)(x)
            x = x + head
            x = Upsampler(self.scale, self.n_feats, dtype=self.dtype)(x)
            x = nn.Conv(self.channels, (3, 3), dtype=self.dtype)(x)
        x = x.astype(jnp.float32)
        return MeanShift(sign=+1, scale=self.rgb_range)(x)


class _ExpertBranch(nn.Module):
    """One expert's residual branch (conv-relu-conv, no skip — the skip and
    res_scale live in :class:`MoEResBlock` so the gated blend stays a pure
    residual)."""

    features: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        r = nn.Conv(self.features, (3, 3), dtype=self.dtype)(x)
        r = nn.relu(r)
        return nn.Conv(self.features, (3, 3), dtype=self.dtype)(r)


class MoEResBlock(nn.Module):
    """Spatially-gated mixture-of-experts residual block.

    In an SR conv stack the natural MoE is *spatial* (parallel/moe.py
    design note): each output pixel softly blends E expert branches (e.g.
    a smooth-region expert vs an edge/texture expert) with a per-pixel
    softmax gate (1x1 conv).  Dense soft gating — every expert computes,
    the gate weighs outputs — so there is no a2a/capacity machinery, and
    the expert dim is a clean ``ep`` mesh axis: params carry a leading
    ``[E, ...]`` axis (``nn.vmap``); shard it over ``ep``
    (:func:`~..parallel.moe.shard_params_ep_named`) and GSPMD computes
    E/ep experts per device, combining with one psum — the same schedule
    :func:`~..parallel.moe.moe_apply` hand-writes with shard_map.
    """

    features: int
    n_experts: int = 4
    res_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        gate = nn.Conv(self.n_experts, (1, 1), dtype=self.dtype,
                       name="gate")(x)
        # softmax in f32: bf16 trunks keep routing numerically stable
        gate = jax.nn.softmax(gate.astype(jnp.float32),
                              axis=-1).astype(self.dtype)
        experts = nn.vmap(
            _ExpertBranch, in_axes=None, out_axes=0,
            variable_axes={"params": 0}, split_rngs={"params": True},
            axis_size=self.n_experts)(self.features, self.dtype,
                                      name="experts")
        ys = experts(x)  # [E, B, H, W, C]
        r = jnp.einsum("ebhwc,bhwe->bhwc", ys, gate)
        return x + r * self.res_scale


class EDSRMoE(nn.Module):
    """EDSR-class trunk with gated mixture-of-experts residual blocks.

    Identical head/tail/upsampler to :class:`EDSR`; every trunk block is a
    :class:`MoEResBlock` (E experts, per-pixel soft gate).  Capacity
    scales with ``n_experts`` while the per-device cost under an ``ep``
    mesh axis stays at E/ep expert branches; trained via
    ``train.loop --model edsr_moe --mesh "dp=2,ep=4"``
    (loss-trajectory parity with the unsharded evaluation pinned in
    tests/test_moe_parallel.py, the pipeline-parallel standard).

    Quality note (round-5 matched-FLOP ablation, RESULTS.md): at SR
    scale the gated trunk does NOT beat a dense EDSR of equal trunk
    FLOPs on either the edges or natural pools — this class is the
    expert-parallel product surface (the ``ep`` sharding pattern), not
    a quality recommendation.
    """

    scale: int = 4
    channels: int = 3
    n_resblocks: int = 8
    n_feats: int = 64
    n_experts: int = 4
    res_scale: float = 1.0
    rgb_range: float = 255.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = MeanShift(sign=-1, scale=self.rgb_range)(x)
        x = x.astype(self.dtype)
        x = head = nn.Conv(self.n_feats, (3, 3), dtype=self.dtype)(x)
        for _ in range(self.n_resblocks):
            x = MoEResBlock(self.n_feats, self.n_experts, self.res_scale,
                            dtype=self.dtype)(x)
        x = nn.Conv(self.n_feats, (3, 3), dtype=self.dtype)(x)
        x = x + head
        x = Upsampler(self.scale, self.n_feats, dtype=self.dtype)(x)
        x = nn.Conv(self.channels, (3, 3), dtype=self.dtype)(x)
        x = x.astype(jnp.float32)
        return MeanShift(sign=+1, scale=self.rgb_range)(x)


def _scaled_he_init(scale: float):
    """He (MSRA) init with weights scaled by ``scale`` — the ESRGAN
    recipe's 'smaller initialization' (weights x0.1 => variance x0.01) that
    makes very deep RRDB stacks trainable.  Measured here: the 23-block
    generator plateaus ~0.3 dB over bicubic with default init but trains
    normally with x0.1 init (round-3 runs)."""
    return nn.initializers.variance_scaling(2.0 * scale * scale, "fan_in",
                                            "truncated_normal")


class DenseBlock(nn.Module):
    """ESRGAN residual dense block: 5 convs with dense connections."""

    nf: int = 64
    gc: int = 32
    init_scale: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        lrelu = functools.partial(nn.leaky_relu, negative_slope=0.2)
        conv = functools.partial(nn.Conv, dtype=self.dtype,
                                 kernel_init=_scaled_he_init(self.init_scale))
        c1 = lrelu(conv(self.gc, (3, 3))(x))
        c2 = lrelu(conv(self.gc, (3, 3))(jnp.concatenate([x, c1], -1)))
        c3 = lrelu(conv(self.gc, (3, 3))(jnp.concatenate([x, c1, c2], -1)))
        c4 = lrelu(conv(self.gc, (3, 3))(jnp.concatenate([x, c1, c2, c3],
                                                         -1)))
        c5 = conv(self.nf, (3, 3))(jnp.concatenate([x, c1, c2, c3, c4], -1))
        return x + 0.2 * c5


class RRDB(nn.Module):
    """Residual-in-residual dense block (3 dense blocks)."""

    nf: int = 64
    gc: int = 32
    init_scale: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        r = x
        for _ in range(3):
            r = DenseBlock(self.nf, self.gc, self.init_scale,
                           dtype=self.dtype)(r)
        return x + 0.2 * r


class RRDBNet(nn.Module):
    """ESRGAN generator: conv -> n_blocks x RRDB -> trunk conv (+skip) ->
    2-stage nearest-neighbour + conv upsampling -> HR convs."""

    scale: int = 4
    channels: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32
    init_scale: float = 0.1  # ESRGAN 'smaller initialization' on the
    # dense-block convs; essential at nb=23 (see _scaled_he_init)
    rgb_range: float = 255.0
    remat: bool = False  # jax.checkpoint each RRDB block (see EDSR.remat)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        lrelu = functools.partial(nn.leaky_relu, negative_slope=0.2)
        x = (x / self.rgb_range).astype(self.dtype)
        fea = nn.Conv(self.nf, (3, 3), dtype=self.dtype)(x)
        trunk = fea
        block = nn.remat(RRDB) if self.remat else RRDB
        for _ in range(self.nb):
            trunk = block(self.nf, self.gc, self.init_scale,
                          dtype=self.dtype)(trunk)
        trunk = nn.Conv(self.nf, (3, 3), dtype=self.dtype)(trunk)
        fea = fea + trunk
        stages = {2: (2,), 4: (2, 2), 8: (2, 2, 2)}[self.scale]
        for r in stages:
            b, h, w, c = fea.shape
            fea = jnp.broadcast_to(fea[:, :, None, :, None, :],
                                   (b, h, r, w, r, c)).reshape(b, h * r, w * r, c)
            fea = lrelu(nn.Conv(self.nf, (3, 3), dtype=self.dtype)(fea))
        fea = lrelu(nn.Conv(self.nf, (3, 3), dtype=self.dtype)(fea))
        out = nn.Conv(self.channels, (3, 3), dtype=self.dtype)(fea)
        return out.astype(jnp.float32) * self.rgb_range


class VGGStyleDiscriminator(nn.Module):
    """ESRGAN discriminator: strided VGG trunk + 2-layer MLP head.

    BatchNorm-free (uses GroupNorm) so the module is stateless and shards
    cleanly over a data-parallel mesh without cross-device batch stats.
    """

    nf: int = 64
    dtype: Any = jnp.float32

    rgb_range: float = 255.0

    @nn.compact
    def __call__(self, x):
        lrelu = functools.partial(nn.leaky_relu, negative_slope=0.2)
        x = (x / self.rgb_range).astype(self.dtype)
        feats = [self.nf, self.nf, self.nf * 2, self.nf * 2, self.nf * 4,
                 self.nf * 4, self.nf * 8, self.nf * 8]
        for i, f in enumerate(feats):
            stride = 2 if i % 2 == 1 else 1
            x = nn.Conv(f, (3, 3) if i % 2 == 0 else (4, 4),
                        strides=(stride, stride), dtype=self.dtype)(x)
            if i > 0:
                x = nn.GroupNorm(num_groups=8, dtype=self.dtype)(x)
            x = lrelu(x)
        x = jnp.mean(x, axis=(1, 2))  # global pool -> size-agnostic head
        x = lrelu(nn.Dense(100, dtype=self.dtype)(x))
        x = nn.Dense(1, dtype=self.dtype)(x)
        return x.astype(jnp.float32)


class BurstFusion(nn.Module):
    """Multi-frame (burst) fusion SR — the reference's *actual* task,
    learned: N sub-pixel-shifted LR frames -> one HR image.

    Align-then-fuse: the caller registers each frame onto the HR grid with
    the known/nominal shifts (``sr.fusion.register_burst`` — explicit
    physics stays explicit), and this trunk learns only what classical IBP
    cannot express: joint deconvolution, denoising, and robustness to
    *residual misregistration* (shift calibration error).  Input is the
    registered stack ``(B, H, W, N)`` on the HR grid (0..255); output
    ``(B, H, W, 1)``, residual over the stack mean (== the SAA estimate,
    so an untrained/zero net already reproduces shift-and-add).
    """

    n_frames: int = 4
    n_feats: int = 48
    n_resblocks: int = 6
    rgb_range: float = 255.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        base = jnp.mean(x, axis=-1, keepdims=True)  # SAA estimate
        h = ((x - self.rgb_range / 2) / self.rgb_range).astype(self.dtype)
        h = nn.Conv(self.n_feats, (3, 3), dtype=self.dtype)(h)
        for _ in range(self.n_resblocks):
            h = ResBlock(self.n_feats, dtype=self.dtype)(h)
        # zero-init head: the model IS shift-and-add at step 0 and training
        # only ever moves it away from the classical estimate
        h = nn.Conv(1, (3, 3), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros)(h)
        return base + h.astype(jnp.float32) * self.rgb_range


class BurstFusionLR(nn.Module):
    """Burst fusion with the trunk on the LR grid — the TPU-first layout.

    :class:`BurstFusion` (round 3) runs its conv trunk on the registered
    HR grid: at the flagship geometry that is 12.6 Mpix x 48 feats of
    activations per layer, and the serving-path breakdown measured the
    engine bandwidth-bound at ~17 HR Mpix/s.  This variant keeps the same
    physics-explicit align-then-fuse design but consumes the registration
    in POLYPHASE form (``ops.resize.keys_register_phases`` /
    ``sr.fusion.register_burst_phases``): input ``(B, h, w, N*f^2)`` — each
    frame's registered HR image packed as f^2 LR-grid phase channels — so
    every trunk conv runs on f^2-x fewer pixels with f^2-x less HBM
    traffic, and the head restores HR by ``pixel_shuffle`` (a layout
    change XLA fuses into the producing conv).  Same recipe as
    ESPCN/EDSR's sub-pixel heads ("all FLOPs stay on the LR grid").

    The mean over frames of the phase stack, pixel-shuffled, IS the
    shift-and-add estimate under the Keys registration — with the
    zero-init head the untrained model reproduces SAA exactly, as the HR
    variant does.  Output ``(B, h*f, w*f, 1)``.
    """

    n_frames: int = 4
    factor: int = 2
    n_feats: int = 64
    n_resblocks: int = 8
    rgb_range: float = 255.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ff = self.factor ** 2
        if x.shape[-1] != self.n_frames * ff:
            raise ValueError(
                f"expected {self.n_frames * ff} phase channels "
                f"({self.n_frames} frames x {ff} phases), got {x.shape[-1]}")
        phases = x.reshape(x.shape[:-1] + (self.n_frames, ff))
        base = pixel_shuffle(jnp.mean(phases, axis=-2), self.factor)
        h = ((x - self.rgb_range / 2) / self.rgb_range).astype(self.dtype)
        h = nn.Conv(self.n_feats, (3, 3), dtype=self.dtype)(h)
        for _ in range(self.n_resblocks):
            h = ResBlock(self.n_feats, dtype=self.dtype)(h)
        h = nn.Conv(ff, (3, 3), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros)(h)
        res = pixel_shuffle(h.astype(jnp.float32), self.factor)
        return base + res * self.rgb_range


MODELS = {
    "srcnn": SRCNN,
    "espcn": ESPCN,
    "fsrcnn": FSRCNN,
    "burstfusion": BurstFusion,
    "burstfusion_lr": BurstFusionLR,
    "edsr": EDSR,
    "edsr_moe": EDSRMoE,
    "rrdbnet": RRDBNet,
}


def create_model(name: str, **kwargs) -> nn.Module:
    return MODELS[name](**kwargs)
