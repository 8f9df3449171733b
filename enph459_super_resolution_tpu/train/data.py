"""Neural-SR data pipeline: on-device degradation, patch sampling, eval sets.

BASELINE.json north star: "the patch-extraction + bicubic-degradation data
loader becomes a fused on-device preprocessing path (decode, crop,
downsample, normalize in one XLA graph)".  Host work = PNG decode into a
pinned pool only; everything after (crop gather, augmentation, Keys-cubic
degradation) is one jitted function over the batch.

With no DIV2K/Set5 on disk, :func:`synthetic_scene_pool` procedurally
generates band-limited scenes with edges/texture so training and the eval
harness run hermetically; point ``image_pool_from_dir`` at a dataset
directory when one is available.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import bicubic_degrade


# ---------------------------------------------------------------------------
# image pools (host)
# ---------------------------------------------------------------------------

def image_pool_from_dir(path: str, max_images: Optional[int] = None,
                        channels: int = 3) -> List[np.ndarray]:
    """Decode a directory of images to float32 HWC arrays (0..255)."""
    from ..data.io import load_image

    exts = (".png", ".jpg", ".jpeg", ".bmp")
    files = sorted(f for f in os.listdir(path)
                   if f.lower().endswith(exts))
    if max_images:
        files = files[:max_images]
    pool = []
    for f in files:
        img = load_image(os.path.join(path, f))
        if img.ndim == 2:
            img = img[:, :, None]
        if img.shape[-1] == 1 and channels == 3:
            img = np.repeat(img, 3, axis=-1)
        if img.shape[-1] >= 3 and channels == 1:
            img = img[:, :, :3].mean(-1, keepdims=True)
        pool.append(img[:, :, :channels].astype(np.float32))
    if not pool:
        raise FileNotFoundError(f"no images in {path}")
    return pool


def synthetic_scene_pool(n_images: int = 32, size: int = 192,
                         channels: int = 3, seed: int = 0
                         ) -> List[np.ndarray]:
    """Procedural scenes: band-limited noise + random boxes/bars/gradients,
    so models have edges and texture to learn (hermetic stand-in for
    DIV2K)."""
    import scipy.ndimage as ndi

    rng = np.random.default_rng(seed)
    pool = []
    for _ in range(n_images):
        img = ndi.gaussian_filter(
            rng.uniform(0, 255, (size, size, channels)), (3.0, 3.0, 0))
        img = (img - img.min()) / max(np.ptp(img), 1e-9) * 200 + 20
        for _ in range(rng.integers(4, 10)):
            y, x = rng.integers(0, size - 24, 2)
            h, w = rng.integers(6, 24, 2)
            img[y:y + h, x:x + w] = rng.uniform(0, 255, (1, 1, channels))
        # a few thin bars (barcode-ish high-frequency content)
        for _ in range(rng.integers(2, 5)):
            x = int(rng.integers(0, size - 20))
            period = int(rng.integers(2, 6))
            v = rng.uniform(150, 255)
            for k in range(0, 18, period):
                img[:, x + k: x + k + max(period // 2, 1)] = v
        pool.append(img.astype(np.float32))
    return pool


def natural_scene_pool(n_images: int = 32, size: int = 192,
                       channels: int = 3, seed: int = 0
                       ) -> List[np.ndarray]:
    """Procedural scenes with *natural-image statistics*: 1/f^a spectra,
    occlusion edges, and stochastic fine-grain texture whose energy lives
    above the x4 LR Nyquist.

    The default :func:`synthetic_scene_pool` is deterministic enough that
    an L1-trained model can essentially invert the degradation
    (grad_ratio ~0.97, RESULTS.md) — there is no oversmoothing for an
    adversarial term to undo, so the perception-distortion tradeoff never
    appears.  This pool is built so it must: the high-frequency texture is
    random in phase, the Keys-cubic x4 degradation destroys it, and the
    L1/MMSE-optimal reconstruction is the blurry conditional mean.  A GAN
    term can only recover the texture *statistics*, trading PSNR for
    sharpness — the classic ESRGAN signature.
    """
    rng = np.random.default_rng(seed)
    import scipy.ndimage as ndi

    fy = np.fft.fftfreq(size)[:, None]
    fx = np.fft.fftfreq(size)[None, :]
    f = np.hypot(fy, fx)
    f[0, 0] = 1.0 / size

    def field(alpha: float) -> np.ndarray:
        spec = (rng.standard_normal((size, size))
                + 1j * rng.standard_normal((size, size))) * f ** (-alpha)
        x = np.fft.ifft2(spec).real
        return (x - x.mean()) / (x.std() + 1e-9)

    pool = []
    for _ in range(n_images):
        base = field(rng.uniform(1.1, 1.6))  # 1/f structure
        # fine-grain texture: band-limited to above the x4 LR Nyquist
        # (|f| > 1/8 cy/HR-px), so decimation by 4 erases it
        hf = rng.standard_normal((size, size))
        hf = np.fft.ifft2(np.fft.fft2(hf) * (f > 0.125)).real
        hf /= hf.std() + 1e-9
        # smoothly varying texture amplitude: matte vs textured regions
        # (sky vs grass), so the model sees both and must decide locally
        amp = ndi.gaussian_filter(rng.uniform(0, 1, (size, size)), 20)
        amp = (amp - amp.min()) / (np.ptp(amp) + 1e-9)
        lum = 120 + 46 * base + 30 * amp ** 2 * hf
        # a few occlusion boundaries: sharp-edged regions with offset shading
        yy, xx = np.mgrid[0:size, 0:size]
        for _ in range(rng.integers(2, 5)):
            cy, cx = rng.uniform(0, size, 2)
            ry, rx = rng.uniform(size / 12, size / 3, 2)
            th = rng.uniform(0, np.pi)
            u = (yy - cy) * np.cos(th) + (xx - cx) * np.sin(th)
            v = -(yy - cy) * np.sin(th) + (xx - cx) * np.cos(th)
            mask = (u / ry) ** 2 + (v / rx) ** 2 < 1
            lum = np.where(mask, lum + rng.uniform(-45, 45), lum)
        img = np.repeat(lum[:, :, None], channels, axis=-1)
        if channels == 3:
            for c in range(3):  # low-frequency chroma
                img[:, :, c] += 12 * field(1.8)
        pool.append(np.clip(img, 0, 255).astype(np.float32))
    return pool


def edges_scene_pool(n_images: int = 32, size: int = 192,
                     channels: int = 3, seed: int = 0
                     ) -> List[np.ndarray]:
    """Procedural *piecewise-smooth* scenes: the Set5-like regime.

    The benchmark images where small SR nets post their literature wins
    (Set5's baby/bird/butterfly) are dominated by smooth shading separated
    by sharp occlusion edges — content whose above-Nyquist energy is
    *deterministic* (edges continue), so a x4 model can genuinely
    reconstruct it.  :func:`synthetic_scene_pool` instead carries
    broadband noise texture and :func:`natural_scene_pool` deliberately
    stochastic fine grain; on both, capacity-starved models (FSRCNN x4)
    can't beat bicubic (RESULTS.md).  This pool isolates the edge regime:
    smooth gradients + overlapping shaded ellipses/half-planes + thin
    curved lines, anti-aliased at ~0.7 px, with NO stochastic texture.
    """
    import scipy.ndimage as ndi

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64)
    pool = []
    for _ in range(n_images):
        # smooth background: low-order ramp + large-scale blobs
        gy, gx = rng.uniform(-40, 40, 2)
        lum = 120 + gy * (yy / size - 0.5) + gx * (xx / size - 0.5)
        lum += ndi.gaussian_filter(rng.uniform(-1, 1, (size, size)), 24) * 90
        # overlapping shaded shapes with sharp boundaries
        for _ in range(rng.integers(8, 16)):
            cy, cx = rng.uniform(0, size, 2)
            ry, rx = rng.uniform(size / 16, size / 3, 2)
            th = rng.uniform(0, np.pi)
            u = (yy - cy) * np.cos(th) + (xx - cx) * np.sin(th)
            v = -(yy - cy) * np.sin(th) + (xx - cx) * np.cos(th)
            if rng.uniform() < 0.25:  # half-plane (straight edge)
                mask = u > 0
            else:  # ellipse
                mask = (u / ry) ** 2 + (v / rx) ** 2 < 1
            sy, sx = rng.uniform(-30, 30, 2)
            shade = (rng.uniform(-70, 70)
                     + sy * (yy - cy) / size + sx * (xx - cx) / size)
            lum = np.where(mask, lum + shade, lum)
        # a few thin curved lines (quadratic strokes)
        for _ in range(rng.integers(2, 6)):
            a, b, c = rng.uniform(-1, 1, 3)
            t = (xx / size - 0.5)
            curve = size * (0.5 + 0.35 * (a * t * t + b * t + c))
            width = rng.uniform(1.0, 2.5)
            d = np.abs(yy - curve)
            lum = np.where(d < width, lum + rng.uniform(-80, 80), lum)
        # optical anti-aliasing: edges get a realistic ~0.7 px width
        lum = ndi.gaussian_filter(lum, 0.7)
        img = np.repeat(lum[:, :, None], channels, axis=-1)
        if channels == 3:
            tint = rng.uniform(0.85, 1.15, 3)
            img = img * tint[None, None, :]
        pool.append(np.clip(img, 0, 255).astype(np.float32))
    return pool


#: procedural pool registry, keyed by the CLIs' ``--pool`` choice
POOL_KINDS = {
    "synthetic": synthetic_scene_pool,
    "natural": natural_scene_pool,
    "edges": edges_scene_pool,
}


# ---------------------------------------------------------------------------
# on-device patch batches
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PatchConfig:
    scale: int = 4
    lr_patch: int = 48  # LR patch size; HR patch = lr_patch * scale
    batch: int = 16
    augment: bool = True


@functools.partial(jax.jit, static_argnames=("scale", "augment"))
def _degrade_batch(hr, rng_key, scale: int, augment: bool):
    """HR patches (B, H, W, C) -> (lr, hr): flips/rot90 + Keys degradation,
    all on device in one graph."""
    if augment:
        kf, kr = jax.random.split(rng_key)
        flips = jax.random.bernoulli(kf, shape=(hr.shape[0], 2))
        rots = jax.random.bernoulli(kr, shape=(hr.shape[0],))
        hr = jnp.where(flips[:, 0, None, None, None],
                       jnp.flip(hr, axis=1), hr)
        hr = jnp.where(flips[:, 1, None, None, None],
                       jnp.flip(hr, axis=2), hr)
        hr = jnp.where(rots[:, None, None, None],
                       jnp.rot90(hr, axes=(1, 2)), hr)
    lr = bicubic_degrade(hr, scale)
    return lr, hr


class PatchSampler:
    """Random HR crops from the pool -> on-device (lr, hr) batches.

    Host side only gathers crop views (cheap numpy slicing); augmentation +
    degradation run jitted on device.
    """

    def __init__(self, pool: List[np.ndarray], cfg: PatchConfig,
                 seed: int = 0):
        self.pool = pool
        self.cfg = cfg
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)
        hr_patch = cfg.lr_patch * cfg.scale
        for i, img in enumerate(pool):
            if img.shape[0] < hr_patch or img.shape[1] < hr_patch:
                raise ValueError(f"pool image {i} smaller than HR patch "
                                 f"{hr_patch}")

    def __iter__(self) -> Iterator[Tuple[jnp.ndarray, jnp.ndarray]]:
        return self

    def __next__(self):
        cfg = self.cfg
        hp = cfg.lr_patch * cfg.scale
        crops = np.empty((cfg.batch, hp, hp, self.pool[0].shape[-1]),
                         dtype=np.float32)
        for b in range(cfg.batch):
            img = self.pool[self.rng.integers(len(self.pool))]
            y = self.rng.integers(0, img.shape[0] - hp + 1)
            x = self.rng.integers(0, img.shape[1] - hp + 1)
            crops[b] = img[y:y + hp, x:x + hp]
        self.key, sub = jax.random.split(self.key)
        return _degrade_batch(jnp.asarray(crops), sub, cfg.scale, cfg.augment)


@functools.partial(jax.jit,
                   static_argnames=("hp", "batch", "scale", "augment"))
def _device_sample_batch(pool_arr, rng_key, hp: int, batch: int,
                         scale: int, augment: bool):
    """(P, H, W, C) device pool -> (lr, hr) batch, fully on device: image
    pick + crop offsets from the jax PRNG, crops via dynamic_slice, then
    the shared augment+degrade graph.  No per-step host->device traffic."""
    p, h, w, _ = pool_arr.shape
    kimg, kyx, kdeg = jax.random.split(rng_key, 3)
    idx = jax.random.randint(kimg, (batch,), 0, p)
    ky, kx = jax.random.split(kyx)
    ys = jax.random.randint(ky, (batch,), 0, h - hp + 1)
    xs = jax.random.randint(kx, (batch,), 0, w - hp + 1)
    crops = jax.vmap(
        lambda i, y, x: jax.lax.dynamic_slice(
            pool_arr[i], (y, x, 0), (hp, hp, pool_arr.shape[-1])))(
        idx, ys, xs)
    return _degrade_batch(crops, kdeg, scale, augment)


class DevicePatchSampler:
    """Device-resident variant of :class:`PatchSampler` for uniform-size
    pools (the hermetic synthetic pool; any same-shaped dataset).

    The whole pool uploads ONCE and stays in HBM; each batch is sampled,
    augmented, and degraded in one jitted graph keyed by a split PRNG.
    Motivation (measured on the tunneled backend): the host-side sampler
    uploads ~7 MB per step, which (a) costs ~0.3 s/step of tunnel
    bandwidth and (b) leaks host staging buffers until the process is
    OOM-killed (~130 GB RSS at 17.6k steps).  On-device sampling sends
    only a PRNG key per step.
    """

    def __init__(self, pool: List[np.ndarray], cfg: PatchConfig,
                 seed: int = 0):
        shapes = {img.shape for img in pool}
        if len(shapes) != 1:
            raise ValueError(f"pool images differ in shape: {shapes}; "
                             "use PatchSampler")
        self.cfg = cfg
        hp = cfg.lr_patch * cfg.scale
        h, w = pool[0].shape[:2]
        if h < hp or w < hp:
            raise ValueError(f"pool images smaller than HR patch {hp}")
        # one upload, passed by reference each call (an argument, not a
        # baked jit constant: big constants blow the remote-compile payload)
        self.pool_arr = jnp.asarray(np.stack(pool))
        self.key = jax.random.PRNGKey(seed)

    def __iter__(self):
        return self

    def __next__(self):
        self.key, sub = jax.random.split(self.key)
        return _device_sample_batch(self.pool_arr, sub,
                                    self.cfg.lr_patch * self.cfg.scale,
                                    self.cfg.batch, self.cfg.scale,
                                    self.cfg.augment)


def make_patch_sampler(pool: List[np.ndarray], cfg: PatchConfig,
                       seed: int = 0):
    """Device-resident sampler when the pool is uniform-shaped, host
    sampler otherwise."""
    try:
        return DevicePatchSampler(pool, cfg, seed)
    except ValueError:
        return PatchSampler(pool, cfg, seed)


# ---------------------------------------------------------------------------
# eval harness (Set5-style protocol)
# ---------------------------------------------------------------------------

def evaluate_sr(apply_fn, params, pool: List[np.ndarray], scale: int,
                shave: Optional[int] = None, on_y: bool = True,
                max_val: float = 255.0) -> dict:
    """PSNR/SSIM of ``apply_fn(params, lr)`` over full images.

    Protocol per the SR literature: LR = Keys-cubic 1/s of the HR (cropped
    to a multiple of s), metrics on the Y channel with an s-pixel border
    shave.  Returns mean psnr/ssim plus the bicubic baseline, and
    ``grad_ratio`` — mean |∇SR| / mean |∇HR| on the same prepped crops — a
    scalar sharpness index: L1-trained SR is oversmoothed (ratio < 1);
    adversarial training pushes it toward 1.  Used as the measured effect
    of the GAN term in the ESRGAN ablation (RESULTS.md).
    """
    from ..eval.metrics import log_spectral_distance, psnr, ssim, y_channel
    from ..ops.resize import bicubic_upsample

    def grad_mag(x):
        gy = x[1:, :-1] - x[:-1, :-1]
        gx = x[:-1, 1:] - x[:-1, :-1]
        return jnp.mean(jnp.sqrt(gy * gy + gx * gx + 1e-12))

    shave = scale if shave is None else shave
    # All per-image metrics stay on device (async dispatch); ONE scalar
    # fetch at the end — a blocking d2h costs ~0.5 s RTT on the tunneled
    # backend, so per-image float() calls would dominate eval time.
    m_psnr, m_ssim, b_psnr = [], [], []
    m_grad, b_grad = [], []
    m_spec, b_spec = [], []
    for img in pool:
        h = img.shape[0] - img.shape[0] % scale
        w = img.shape[1] - img.shape[1] % scale
        hr = jnp.asarray(img[:h, :w])
        lr = bicubic_degrade(hr[None], scale)[0]
        sr = apply_fn(params, lr[None])[0]
        bic = bicubic_upsample(lr[None], scale)[0]

        def prep(x):
            x = jnp.clip(x, 0, max_val)
            if on_y and x.shape[-1] == 3:
                x = y_channel(x)
            else:
                x = x[..., 0] if x.ndim == 3 else x
            return x[shave:-shave, shave:-shave]

        hr_p = prep(hr)
        sr_p = prep(sr)
        bic_p = prep(bic)
        m_psnr.append(psnr(sr_p, hr_p, max_val))
        m_ssim.append(ssim(sr_p, hr_p, max_val))
        b_psnr.append(psnr(bic_p, hr_p, max_val))
        hr_g = grad_mag(hr_p)
        m_grad.append(grad_mag(sr_p) / hr_g)
        b_grad.append(grad_mag(bic_p) / hr_g)
        m_spec.append(log_spectral_distance(sr_p, hr_p))
        b_spec.append(log_spectral_distance(bic_p, hr_p))
    vals = np.asarray(jnp.stack(
        [jnp.mean(jnp.stack(xs)) for xs in
         (m_psnr, m_ssim, b_psnr, m_grad, b_grad, m_spec, b_spec)]))
    return {
        "psnr": float(vals[0]),
        "ssim": float(vals[1]),
        "bicubic_psnr": float(vals[2]),
        "grad_ratio": float(vals[3]),
        "bicubic_grad_ratio": float(vals[4]),
        "spec_dist": float(vals[5]),
        "bicubic_spec_dist": float(vals[6]),
        "n_images": len(pool),
    }
