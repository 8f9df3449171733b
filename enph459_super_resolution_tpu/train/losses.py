"""Losses for neural SR training: pixel, perceptual, and (relativistic) GAN.

BASELINE.json north-star: "L1/L2 and perceptual losses"; the ESRGAN
fine-tune config adds the relativistic-average GAN objective.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred, target):
    return jnp.mean(jnp.square(pred - target))


def charbonnier_loss(pred, target, eps: float = 1e-3):
    """Smooth L1 used by many SR trainers (LapSRN et al.)."""
    return jnp.mean(jnp.sqrt(jnp.square(pred - target) + eps * eps))


PIXEL_LOSSES = {"l1": l1_loss, "l2": l2_loss, "charbonnier": charbonnier_loss}


def psnr(pred, target, max_val: float = 255.0):
    mse = jnp.mean(jnp.square(pred - target))
    return 10.0 * jnp.log10(max_val * max_val / jnp.maximum(mse, 1e-12))


# --------------------------------------------------------------------------
# Relativistic average GAN (ESRGAN objective)
# --------------------------------------------------------------------------

def _ra_logits(real_logits, fake_logits):
    d_real = real_logits - jnp.mean(fake_logits)
    d_fake = fake_logits - jnp.mean(real_logits)
    return d_real, d_fake


def ragan_discriminator_loss(real_logits, fake_logits):
    """D maximizes: real more realistic than average fake, and vice versa."""
    d_real, d_fake = _ra_logits(real_logits, fake_logits)
    loss_real = jnp.mean(jax.nn.softplus(-d_real))   # BCE(D_ra(xr, xf), 1)
    loss_fake = jnp.mean(jax.nn.softplus(d_fake))    # BCE(D_ra(xf, xr), 0)
    return 0.5 * (loss_real + loss_fake)


def ragan_generator_loss(real_logits, fake_logits):
    """G's adversarial term (symmetric relativistic form)."""
    d_real, d_fake = _ra_logits(real_logits, fake_logits)
    loss_real = jnp.mean(jax.nn.softplus(d_real))    # BCE(D_ra(xr, xf), 0)
    loss_fake = jnp.mean(jax.nn.softplus(-d_fake))   # BCE(D_ra(xf, xr), 1)
    return 0.5 * (loss_real + loss_fake)


# --------------------------------------------------------------------------
# Perceptual loss
# --------------------------------------------------------------------------

class PerceptualLoss:
    """Feature-space L1 given a feature extractor ``feat_fn(img)->features``.

    The canonical extractor is pre-activation VGG19 conv5_4 — built from a
    torchvision checkpoint via :mod:`.vgg` (``make_vgg_feature_fn(
    load_torch_vgg19(path))``).  When VGG weights are unavailable (this
    environment has no torchvision weight cache), :func:`gradient_feature_fn`
    provides a weight-free edge/structure extractor so the perceptual term
    stays trainable and testable.
    """

    def __init__(self, feat_fn: Optional[Callable] = None):
        self.feat_fn = feat_fn or gradient_feature_fn

    def __call__(self, pred, target):
        fp = self.feat_fn(pred)
        ft = self.feat_fn(target)
        if not isinstance(fp, (list, tuple)):
            fp, ft = [fp], [ft]
        return sum(jnp.mean(jnp.abs(a - b)) for a, b in zip(fp, ft))


def gradient_feature_fn(x):
    """Weight-free structural features: multi-scale image gradient maps.

    Stand-in for VGG features when pretrained weights are not present;
    penalizes edge/structure mismatch rather than raw pixels.  Input is
    NHWC; returns a list of gradient maps at scales 1 and 2.
    """
    feats = []
    for s in (1, 2):
        xs = x[:, ::s, ::s, :]
        feats.append(xs[:, 1:, :, :] - xs[:, :-1, :, :])
        feats.append(xs[:, :, 1:, :] - xs[:, :, :-1, :])
    return feats
