"""Fused-trunk serving paths for the conv-trunk models.

These reimplement the EDSR / BurstFusionLR forward passes with the trunk
running in the VMEM-resident Pallas kernel (ops/pallas_trunk.py) and the
thin head/tail convs in XLA.  Mathematically the same network as the flax
modules in models/zoo.py (same params, same 'SAME' zero padding, bf16
trunk with f32 accumulation) — parity is pinned in
tests/test_pallas_trunk.py::test_edsr_fused_apply_matches_flax.

This is a SERVING path: gradients don't flow through pallas_call here;
training stays on the flax modules.  Used by bench.py's
``edsr_x4*_fused`` rows and the burst fusion engine when
``SRTPU_FUSED_TRUNK`` enables it.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import pallas_trunk as pt
from .common import DIV2K_RGB_MEAN, pixel_shuffle


def _conv(x, k, b, dtype):
    """flax.linen.Conv-equivalent 'SAME' conv (NHWC/HWIO, f32 accum)."""
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), jnp.asarray(k, dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y + jnp.asarray(b, jnp.float32)).astype(dtype)


def _trunk_convs(p, n_resblocks):
    convs = []
    for i in range(n_resblocks):
        blk = p[f"ResBlock_{i}"]
        convs.append((blk["Conv_0"]["kernel"], blk["Conv_0"]["bias"]))
        convs.append((blk["Conv_1"]["kernel"], blk["Conv_1"]["bias"]))
    return convs


def make_edsr_fused_apply(model, params, *, band: int = 8192,
                          chunk: int = 1024, g2: int = 2, fuse: int = 4,
                          wstrip: int | None = 512,
                          dtype: Any = jnp.bfloat16,
                          interpret: bool = False, jit: bool = True):
    """Serving ``fn(x)`` for an EDSR model with the fused Pallas trunk.

    ``model`` is the models/zoo.py::EDSR instance (unrolled trunk layout)
    whose ``params`` were trained; the returned fn maps
    [B, H, W, C] 0..rgb_range -> [B, H*s, W*s, C] f32, matching
    ``model.apply`` to bf16 tolerance.
    """
    if model.scan_trunk:
        raise ValueError("fused serving expects the unrolled trunk layout")
    p = params["params"] if "params" in params else params
    packed = pt.pack_trunk(_trunk_convs(p, model.n_resblocks), g2, fuse,
                           dtype=dtype)
    stages = {2: (2,), 3: (3,), 4: (2, 2), 8: (2, 2, 2)}[model.scale]
    mean3 = np.asarray(DIV2K_RGB_MEAN, np.float32) * model.rgb_range
    res_scale = float(model.res_scale)

    def apply_fn(x):
        mean = mean3 if x.shape[-1] == 3 else mean3.mean(keepdims=True)
        x = x - mean
        h = _conv(x, p["Conv_0"]["kernel"], p["Conv_0"]["bias"], dtype)
        t = pt.fused_resblocks_packed(
            h, packed, res_scale=res_scale, band=band, chunk=chunk,
            g2=g2, dtype=dtype, wstrip=wstrip, interpret=interpret)
        t = _conv(t, p["Conv_1"]["kernel"], p["Conv_1"]["bias"], dtype)
        t = t + h
        for i, r in enumerate(stages):
            up = p["Upsampler_0"][f"Conv_{i}"]
            t = _conv(t, up["kernel"], up["bias"], dtype)
            t = pixel_shuffle(t, r)
        y = _conv(t, p["Conv_2"]["kernel"], p["Conv_2"]["bias"], dtype)
        return y.astype(jnp.float32) + mean

    return jax.jit(apply_fn) if jit else apply_fn


def make_burst_lr_fused_apply(model, params, *, band: int = 8192,
                              chunk: int = 1024, g2: int = 2,
                              fuse: int = 4, wstrip: int | None = 512,
                              dtype: Any = jnp.bfloat16,
                              interpret: bool = False, jit: bool = True):
    """Serving ``fn(phases)`` for models/zoo.py::BurstFusionLR with the
    fused Pallas trunk (phases [B, h, w, N*f^2] -> HR [B, h*f, w*f, 1])."""
    p = params["params"] if "params" in params else params
    packed = pt.pack_trunk(_trunk_convs(p, model.n_resblocks), g2, fuse,
                           dtype=dtype)
    f = model.factor
    ff = f * f
    rng_range = float(model.rgb_range)

    def apply_fn(x):
        phases = x.reshape(x.shape[:-1] + (model.n_frames, ff))
        base = pixel_shuffle(jnp.mean(phases, axis=-2), f)
        h = ((x - rng_range / 2) / rng_range).astype(dtype)
        h = _conv(h, p["Conv_0"]["kernel"], p["Conv_0"]["bias"], dtype)
        h = pt.fused_resblocks_packed(
            h, packed, res_scale=1.0, band=band, chunk=chunk, g2=g2,
            dtype=dtype, wstrip=wstrip, interpret=interpret)
        h = _conv(h, p["Conv_1"]["kernel"], p["Conv_1"]["bias"], dtype)
        res = pixel_shuffle(h.astype(jnp.float32), f)
        return base + res * rng_range

    return jax.jit(apply_fn) if jit else apply_fn
