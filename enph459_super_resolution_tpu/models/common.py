"""Shared building blocks for the neural SR model zoo.

The BASELINE.json north-star configs (SRCNN / ESPCN / FSRCNN / EDSR /
ESRGAN-RRDB) all decompose into plain convs + sub-pixel (depth_to_space)
upsampling — both map directly onto the TPU MXU.  Layout is NHWC (TPU's
native conv layout); compute dtype is configurable so trunks can run
bfloat16 with float32 params.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# DIV2K RGB channel means (0..1 scale), the standard EDSR normalization.
DIV2K_RGB_MEAN = (0.4488, 0.4371, 0.4040)


def pixel_shuffle(x, r: int):
    """Sub-pixel upsample: (..., H, W, C*r^2) -> (..., H*r, W*r, C).

    Pure reshape/transpose — XLA lowers this to a layout change fused with
    the producing conv, the idiomatic TPU equivalent of the reference
    stack's interpolation-based upsamplers.
    """
    *lead, h, w, c = x.shape
    if c % (r * r) != 0:
        raise ValueError(f"channels {c} not divisible by r^2={r * r}")
    c_out = c // (r * r)
    x = x.reshape(*lead, h, w, r, r, c_out)
    # (..., H, W, rh, rw, C) -> (..., H, rh, W, rw, C)
    nlead = len(lead)
    perm = tuple(range(nlead)) + (nlead, nlead + 2, nlead + 1, nlead + 3,
                                  nlead + 4)
    x = x.transpose(perm)
    return x.reshape(*lead, h * r, w * r, c_out)


class MeanShift(nn.Module):
    """Subtract (or add back) fixed channel means, in the input's scale."""

    rgb_mean: Sequence[float] = DIV2K_RGB_MEAN
    sign: int = -1
    scale: float = 1.0  # data range (1.0 or 255.0)

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray(self.rgb_mean, dtype=x.dtype) * self.scale
        if x.shape[-1] != len(self.rgb_mean):
            mean = jnp.mean(mean, keepdims=True)
        return x + self.sign * mean


class ConvBlock(nn.Module):
    """Conv -> optional activation, NHWC."""

    features: int
    kernel: int = 3
    act: Callable | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    dtype=self.dtype, name="conv")(x)
        if self.act is not None:
            x = self.act(x)
        return x


class ResBlock(nn.Module):
    """EDSR residual block: conv-relu-conv, residual-scaled, NO batchnorm."""

    features: int
    res_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        r = nn.Conv(self.features, (3, 3), dtype=self.dtype)(x)
        r = nn.relu(r)
        r = nn.Conv(self.features, (3, 3), dtype=self.dtype)(r)
        return x + r * self.res_scale


class Upsampler(nn.Module):
    """Pixel-shuffle upsampler: conv to C*r^2 then depth_to_space, staged
    in factors of 2/3 like EDSR."""

    scale: int
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = self.scale
        stages: Tuple[int, ...]
        if s in (2, 3):
            stages = (s,)
        elif s == 4:
            stages = (2, 2)
        elif s == 8:
            stages = (2, 2, 2)
        else:
            raise ValueError(f"unsupported scale {s}")
        for r in stages:
            x = nn.Conv(self.features * r * r, (3, 3), dtype=self.dtype)(x)
            x = pixel_shuffle(x, r)
        return x
