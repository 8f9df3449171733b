"""VGG19 feature extractor for the paper-exact ESRGAN perceptual loss.

The ESRGAN recipe (Wang et al. 2018) defines the perceptual term as an L1
distance between *pre-activation* VGG19 conv5_4 features of SR and HR.  The
reference repo has no neural stack at all (SURVEY.md §0) — this module
exists for the BASELINE.json north-star configs.  In environments without
pretrained weights (this one: no torchvision weight cache, zero egress),
:class:`~.losses.PerceptualLoss` falls back to weight-free gradient
features; when a torchvision ``vgg19`` checkpoint IS available, load it
with :func:`load_torch_vgg19` and the loss becomes the paper's.

NHWC, float32; inputs in ``[0, rgb_range]`` are normalized with the
ImageNet statistics the torchvision weights were trained with.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# (block, convs-in-block, width) — the VGG19 "E" configuration.
VGG19_BLOCKS: Tuple[Tuple[int, int, int], ...] = (
    (1, 2, 64), (2, 2, 128), (3, 4, 256), (4, 4, 512), (5, 4, 512))

# torchvision ``vgg19().features`` module indices of each conv layer, in
# network order — used to translate a torch state_dict into flax params.
_TORCH_CONV_INDICES = (0, 2, 5, 7, 10, 12, 14, 16,
                       19, 21, 23, 25, 28, 30, 32, 34)

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def conv_names() -> Tuple[str, ...]:
    """('conv1_1', 'conv1_2', 'conv2_1', ..., 'conv5_4') in network order."""
    names = []
    for block, n_convs, _ in VGG19_BLOCKS:
        names.extend(f"conv{block}_{i + 1}" for i in range(n_convs))
    return tuple(names)


class VGG19Features(nn.Module):
    """VGG19 trunk that returns the requested intermediate feature maps.

    Args:
      layers: conv names whose outputs to return (in network order).
      pre_activation: return conv outputs BEFORE ReLU (the ESRGAN choice;
        ``False`` gives the older SRGAN post-activation features).
      rgb_range: input scale (255 for this framework's pipelines).
    """

    layers: Sequence[str] = ("conv5_4",)
    pre_activation: bool = True
    rgb_range: float = 255.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        wanted = set(self.layers)
        unknown = wanted - set(conv_names())
        if unknown:
            raise ValueError(f"unknown VGG19 layers: {sorted(unknown)}")
        if x.shape[-1] == 1:  # grayscale pipelines: replicate to RGB
            x = jnp.repeat(x, 3, axis=-1)
        x = x.astype(self.dtype) / self.rgb_range
        mean = jnp.asarray(IMAGENET_MEAN, self.dtype)
        std = jnp.asarray(IMAGENET_STD, self.dtype)
        x = (x - mean) / std

        feats = {}
        last = max(conv_names().index(n) for n in wanted)
        idx = 0
        for block, n_convs, width in VGG19_BLOCKS:
            for i in range(n_convs):
                name = f"conv{block}_{i + 1}"
                x = nn.Conv(width, (3, 3), dtype=self.dtype, name=name)(x)
                if name in wanted and self.pre_activation:
                    feats[name] = x
                x = nn.relu(x)
                if name in wanted and not self.pre_activation:
                    feats[name] = x
                if idx == last:
                    return [feats[n] for n in self.layers]
                idx += 1
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return [feats[n] for n in self.layers]


def params_from_torch_state_dict(state_dict) -> dict:
    """Translate a torchvision ``vgg19`` state_dict into flax params.

    Accepts torch tensors or numpy arrays under the standard
    ``features.{idx}.weight`` / ``.bias`` keys; conv kernels convert
    OIHW -> HWIO (NHWC flax layout).
    """
    def to_np(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v)

    params = {}
    for name, tidx in zip(conv_names(), _TORCH_CONV_INDICES):
        w = to_np(state_dict[f"features.{tidx}.weight"])
        b = to_np(state_dict[f"features.{tidx}.bias"])
        params[name] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0), jnp.float32),
            "bias": jnp.asarray(b, jnp.float32),
        }
    return {"params": params}


def load_torch_vgg19(path: str) -> dict:
    """Load a torchvision ``vgg19`` checkpoint (.pth) into flax params."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return params_from_torch_state_dict(sd)


def make_vgg_feature_fn(params, layers: Sequence[str] = ("conv5_4",),
                        pre_activation: bool = True,
                        rgb_range: float = 255.0):
    """Feature fn for :class:`~.losses.PerceptualLoss`.

    ``PerceptualLoss(make_vgg_feature_fn(load_torch_vgg19(path)))`` is the
    paper-exact ESRGAN perceptual objective.
    """
    model = VGG19Features(layers=tuple(layers), pre_activation=pre_activation,
                          rgb_range=rgb_range)

    def feat_fn(x):
        return model.apply(params, x)

    return feat_fn
