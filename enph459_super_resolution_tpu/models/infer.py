"""Full-image neural SR inference: receptive-field-exact tiled execution.

BASELINE.json config #5: "Tiled 4K full-image inference with halo
stitching, batch-sharded across TPU mesh."  A conv trunk's output pixel
depends only on inputs within its receptive field, so splitting the image
into tiles extended by a receptive-field halo and keeping tile interiors is
*exact* — enabling arbitrarily large inputs at bounded memory, and spatial
sharding over a mesh (`parallel.tiled.tiled_apply`) when multiple devices
exist.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import numpy as np


def receptive_field_radius(model: nn.Module) -> int:
    """Conservative receptive-field radius (LR px) for the zoo trunks."""
    name = type(model).__name__.lower()
    if name == "srcnn":
        return (9 + 5 + 5 - 3) // 2 + 1          # 9
    if name == "espcn":
        return (5 + 3 + 3 - 3) // 2 + 1          # 5
    if name == "fsrcnn":
        m = getattr(model, "m", 4)
        return (5 + 1 + 3 * m + 1 + 9 - 5 + 4) // 2 + 2
    if name == "edsr":
        n = getattr(model, "n_resblocks", 16)
        convs = 2 + 2 * n + 2 + 1  # head + blocks + tail + up convs
        return convs + 2
    if name == "rrdbnet":
        nb = getattr(model, "nb", 23)
        convs = 2 + 15 * nb + 3
        return convs + 2
    raise ValueError(f"unknown model {name}; pass halo explicitly")


def tiled_infer(model: nn.Module, params, lr, tile: int = 256,
                halo: Optional[int] = None, scale: Optional[int] = None,
                batch_tiles: int = 8, out_dtype=np.float32,
                rgb_range: float = 255.0):
    """SR a full (possibly huge) image by exact overlap-halo tiling.

    Args:
      lr: (H, W, C) or (B, H, W, C) float array.
      tile: interior tile size in LR pixels (grid-aligned; edge tiles pad).
      halo: receptive-field radius override in LR pixels.
      batch_tiles: tiles per device dispatch.  Tiles are independent, so
        they stack on the batch axis and run as ONE batched apply — on the
        target backend each dispatch+fetch round trip costs ~0.5 s, so
        chunking 8 tiles per call cuts a 4K x4 run from ~64 round trips to
        ~8.  The ragged tail pads with repeated tiles (discarded).
      out_dtype: ``np.uint8`` clips to [0, rgb_range] and TRUNCATES on
        DEVICE (reference ``to_uint8`` quantization) before the fetch.
        Together with the on-device interior crop this cuts host transfer
        ~7x — decisive on the tunneled backend, where a 4K x4 run is
        fetch-bandwidth-bound, and lossless whenever the consumer wants
        uint8 PNGs anyway.

    Peak device memory is O(batch_tiles * tile^2) regardless of image size.
    """
    import jax.numpy as jnp

    scale = scale if scale is not None else getattr(model, "scale", 1)
    halo = halo if halo is not None else receptive_field_radius(model)
    squeeze = lr.ndim == 3
    if squeeze:
        lr = lr[None]
    b, h, w, c = lr.shape
    ts = tile * scale

    def quantize(x):
        if np.dtype(out_dtype) == np.uint8:
            return jnp.clip(x, 0, rgb_range).astype(jnp.uint8)
        return x.astype(out_dtype)

    apply_fn = jax.jit(model.apply)
    ext = tile + 2 * halo
    if h <= ext or w <= ext:  # small image: nothing to tile
        out = np.asarray(jax.jit(
            lambda p, x: quantize(model.apply(p, x.astype(jnp.float32))))(
                params, lr))
        return out[0] if squeeze else out
    ny = math.ceil(h / tile)
    nx = math.ceil(w / tile)

    @jax.jit
    def apply_crop(p, patches, starts):
        """Batched apply + ON-DEVICE interior crop + quantization: only
        (tile*scale)^2 pixels per tile ever cross the host link.  uint8
        inputs upload as-is (4x less host->device traffic) and promote to
        f32 on device."""
        patches = patches.astype(jnp.float32)
        sr = model.apply(p, patches.reshape((-1, ext, ext, c)))
        sr = sr.reshape((-1, b) + sr.shape[1:])

        def crop(img_b, sy, sx):
            zero = jnp.zeros((), sy.dtype)
            return jax.lax.dynamic_slice(img_b, (zero, sy, sx, zero),
                                         (b, ts, ts, c))

        return quantize(jax.vmap(crop)(sr, starts[:, 0], starts[:, 1]))

    # Patch windows are CLAMPED into the image (never padded): an edge
    # tile's patch boundary coincides with the true image edge, so the
    # conv stack's own SAME zero-padding applies there exactly as in the
    # whole-image forward.  (Extending with zeros would NOT be exact:
    # biases + nonlinearities make layer-2's view of a zero halo differ
    # from its own SAME padding.)  Interior cuts are covered by the
    # receptive-field halo.  Result: bitwise-equal to the whole-image
    # apply, O(batch_tiles * tile^2) peak memory.
    lr_np = np.asarray(lr)
    jobs = []  # (y0, x0, t_h, t_w, ys, xs, cy, cx) per tile; the device
    # crop starts at (cy, cx) — clamped so a full tile*scale crop always
    # fits inside the ext*scale output — and the host offset adjusts.
    for iy in range(ny):
        for ix in range(nx):
            y0, x0 = iy * tile, ix * tile
            t_h, t_w = min(tile, h - y0), min(tile, w - x0)
            ys = int(np.clip(y0 - halo, 0, h - ext))
            xs = int(np.clip(x0 - halo, 0, w - ext))
            cy = min(y0 - ys, ext - tile) * scale
            cx = min(x0 - xs, ext - tile) * scale
            jobs.append((y0, x0, t_h, t_w, ys, xs, cy, cx))

    out = np.zeros((b, h * scale, w * scale, c), dtype=out_dtype)
    chunk = max(1, min(batch_tiles, len(jobs)))
    for j0 in range(0, len(jobs), chunk):
        batch_jobs = jobs[j0: j0 + chunk]
        # pad the tail chunk by repeating its last job: one compiled shape
        padded = batch_jobs + [batch_jobs[-1]] * (chunk - len(batch_jobs))
        patches = np.stack(
            [lr_np[:, ys: ys + ext, xs: xs + ext]
             for (_, _, _, _, ys, xs, _, _) in padded], axis=0)
        starts = np.asarray([(cy, cx) for *_, cy, cx in padded], np.int32)
        sr = np.asarray(apply_crop(params, patches, starts))
        for k, (y0, x0, t_h, t_w, ys, xs, cy, cx) in enumerate(batch_jobs):
            oy = (y0 - ys) * scale - cy
            ox = (x0 - xs) * scale - cx
            out[:, y0 * scale: (y0 + t_h) * scale,
                x0 * scale: (x0 + t_w) * scale] = \
                sr[k, :, oy: oy + t_h * scale, ox: ox + t_w * scale]
    return out[0] if squeeze else out


def tiled_infer_sharded(model: nn.Module, params, lr, mesh,
                        halo: Optional[int] = None,
                        scale: Optional[int] = None, sp_axis: str = "sp"):
    """Mesh-sharded variant: the image's H axis is split over ``sp_axis``
    devices with a single ppermute halo exchange (parallel.tiled).

    Interior-exact vs the whole-image apply; within ``halo * scale`` rows
    of the two GLOBAL image edges the result may differ slightly — SPMD
    tiles must share one shape, so the zero-filled edge halo cannot
    replicate SAME-conv boundary handling through biased nonlinear layers
    (use :func:`tiled_infer` when bit-exact borders matter)."""
    from ..parallel.tiled import tiled_apply

    scale = scale if scale is not None else getattr(model, "scale", 1)
    halo = halo if halo is not None else receptive_field_radius(model)
    squeeze = lr.ndim == 3
    if squeeze:
        lr = lr[None]

    def fn(tile):
        return model.apply(params, tile)

    out = tiled_apply(fn, lr, mesh, halo=halo, axis=1, out_scale=scale,
                      sp_axis=sp_axis, edge_mode="zero")
    return out[0] if squeeze else out
