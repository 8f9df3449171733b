"""Train state: params + optimizer + EMA, and jitted/sharded train steps.

TPU-first training loop design:
  * ``jax.jit`` with ``donate_argnums`` on the state (no host round-trips,
    buffers reused in place).
  * Data parallelism via ``NamedSharding`` on the batch: params replicated,
    batch split over the mesh 'dp' axis; XLA inserts the gradient psum.
  * EMA weights (BASELINE.json north-star) carried inside the state so one
    step = one compiled graph.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .losses import PIXEL_LOSSES, psnr


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation):
        # EMA starts as a *copy*: sharing buffers with params would make
        # donation (donate_argnums on the state) alias the same buffer twice.
        ema = jax.tree.map(jnp.copy, params)
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), ema_params=ema)


def ema_update(ema, new, decay: float):
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p, ema, new)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    loss: str = "l1"
    ema_decay: float = 0.999
    grad_clip: Optional[float] = None
    lr_halve_every: Optional[int] = None  # EDSR-style step decay
    weight_decay: float = 0.0


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    if cfg.lr_halve_every:
        sched = optax.exponential_decay(
            cfg.learning_rate, transition_steps=cfg.lr_halve_every,
            decay_rate=0.5, staircase=True)
    else:
        sched = cfg.learning_rate
    tx = optax.adamw(sched, weight_decay=cfg.weight_decay) \
        if cfg.weight_decay else optax.adam(sched)
    if cfg.grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx


def make_train_step(apply_fn: Callable, tx: optax.GradientTransformation,
                    cfg: TrainConfig,
                    extra_loss: Optional[Callable] = None):
    """Build ``step(state, lr_batch, hr_batch) -> (state, metrics)``.

    ``apply_fn(params, lr) -> sr``; ``extra_loss(sr, hr) -> scalar`` is an
    optional additive term (e.g. perceptual).  Jit/donation/sharding are
    applied by the caller (see ``parallel.mesh.shard_train_step``).
    """
    pixel_loss = PIXEL_LOSSES[cfg.loss]

    def loss_fn(params, lr, hr):
        sr = apply_fn(params, lr)
        loss = pixel_loss(sr, hr)
        if extra_loss is not None:
            loss = loss + extra_loss(sr, hr)
        return loss, sr

    def step(state: TrainState, lr, hr) -> Tuple[TrainState, Dict]:
        (loss, sr), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, lr, hr)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema_params, params, cfg.ema_decay)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, ema_params=ema)
        metrics = {
            "loss": loss,
            "psnr": psnr(sr, hr),
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return step


# --------------------------------------------------------------------------
# GAN (ESRGAN fine-tune) two-player step
# --------------------------------------------------------------------------

@struct.dataclass
class GANTrainState:
    step: jnp.ndarray
    g: TrainState
    d_params: Any
    d_opt_state: Any


def make_gan_train_step(g_apply: Callable, d_apply: Callable,
                        g_tx, d_tx, cfg: TrainConfig,
                        pixel_weight: float = 1e-2,
                        percep_loss: Optional[Callable] = None,
                        gan_weight: float = 5e-3,
                        d_every: int = 1,
                        instance_noise: float = 0.0,
                        noise_seed: int = 0):
    """ESRGAN objective: L_G = percep + λ·RaGAN + η·L1; alternating D step.

    Balance knobs (a saturating discriminator — d_loss → 0 — starves the
    generator of adversarial gradient):
      * ``d_every``: update D only every N steps (G gets N steps per D step).
      * ``instance_noise``: σ of Gaussian noise (in pixel counts, images are
        0..255) added to BOTH real and fake D inputs — keeps the supports of
        the two distributions overlapping so D cannot separate them
        perfectly (Sønderby et al. 2016).
      * A weaker D optimizer is the caller's job (pass a ``d_tx`` built from
        a lower learning rate).
    ``gan_weight=0`` turns the step into the perceptual-only ablation (the
    D still trains, but contributes no gradient to G).
    """
    from .losses import l1_loss, ragan_discriminator_loss, ragan_generator_loss

    base_key = jax.random.PRNGKey(noise_seed)

    def noisy(x, key):
        if instance_noise <= 0.0:
            return x
        return x + instance_noise * jax.random.normal(key, x.shape, x.dtype)

    def g_loss_fn(g_params, d_params, lr, hr, key):
        sr = g_apply(g_params, lr)
        kf, kr = jax.random.split(key)
        fake_logits = d_apply(d_params, noisy(sr, kf))
        real_logits = d_apply(d_params, noisy(hr, kr))
        loss = gan_weight * ragan_generator_loss(real_logits, fake_logits)
        loss = loss + pixel_weight * l1_loss(sr, hr)
        if percep_loss is not None:
            loss = loss + percep_loss(sr, hr)
        return loss, sr

    def d_loss_fn(d_params, sr, hr, key):
        kf, kr = jax.random.split(key)
        fake_logits = d_apply(d_params,
                              noisy(jax.lax.stop_gradient(sr), kf))
        real_logits = d_apply(d_params, noisy(hr, kr))
        return ragan_discriminator_loss(real_logits, fake_logits)

    def step(state: GANTrainState, lr, hr):
        key = jax.random.fold_in(base_key, state.step)
        kg, kd = jax.random.split(key)
        (g_loss, sr), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g.params, state.d_params, lr, hr, kg)
        g_updates, g_opt = g_tx.update(g_grads, state.g.opt_state,
                                       state.g.params)
        g_params = optax.apply_updates(state.g.params, g_updates)
        ema = ema_update(state.g.ema_params, g_params, cfg.ema_decay)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
            state.d_params, sr, hr, kd)

        def upd_d(_):
            d_updates, d_opt = d_tx.update(d_grads, state.d_opt_state,
                                           state.d_params)
            return optax.apply_updates(state.d_params, d_updates), d_opt

        if d_every > 1:
            d_params, d_opt = jax.lax.cond(
                state.step % d_every == 0, upd_d,
                lambda _: (state.d_params, state.d_opt_state), None)
        else:
            d_params, d_opt = upd_d(None)

        new_state = GANTrainState(
            step=state.step + 1,
            g=TrainState(step=state.g.step + 1, params=g_params,
                         opt_state=g_opt, ema_params=ema),
            d_params=d_params, d_opt_state=d_opt)
        metrics = {"g_loss": g_loss, "d_loss": d_loss, "psnr": psnr(sr, hr)}
        return new_state, metrics

    return step
