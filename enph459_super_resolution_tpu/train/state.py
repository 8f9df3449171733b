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


def restore_checkpoint_numpy(ckpt_dir: str, step: Optional[int] = None):
    """Restore an orbax checkpoint as a plain numpy pytree -> (tree, step).

    Platform-portable: a template-free ``CheckpointManager.restore`` puts
    arrays back on the devices recorded at save time, so a chip-trained
    checkpoint refuses to load on a CPU-only host ("Device TPU ... was not
    found").  Restoring against the checkpoint's own metadata tree with
    ``RestoreArgs(restore_type=np.ndarray)`` ignores the saved shardings
    entirely — weights land as host numpy, usable on any backend.
    """
    import os

    import numpy as np
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    if step is None:
        mngr = ocp.CheckpointManager(ckpt_dir)
        step = mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(ckpt_dir, str(int(step)), "default")
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(path).item_metadata.tree
    args = jax.tree.map(
        lambda m: ocp.RestoreArgs(restore_type=np.ndarray), meta)
    return ckptr.restore(path, restore_args=args), int(step)


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
class GANBalance:
    """Two-player balance knobs, carried as RUNTIME scalars in the state.

    On the tunneled backend a recompile of the RRDB-23 + discriminator
    step costs tens of minutes, so the knobs must not be baked jit
    constants: keeping them in the state pytree means the gan_weight=0
    ablation, the live-GAN run, and any mid-run retuning (e.g. lowering
    the D step size when d_loss saturates toward 0) all reuse ONE
    compiled graph — ``state.replace(balance=...)`` between steps.
    """
    gan_weight: jnp.ndarray      # λ on the RaGAN G term (0 = ablation)
    d_lr_scale: jnp.ndarray      # scales D's optimizer *updates*; for Adam
    # this is exactly a learning-rate scale (update = lr · m̂/(√v̂+ε))
    d_every: jnp.ndarray         # D updates only when step % d_every == 0
    instance_noise: jnp.ndarray  # σ (pixel counts, 0..255) on D inputs

    @classmethod
    def create(cls, gan_weight: float = 5e-3, d_lr_scale: float = 1.0,
               d_every: int = 1, instance_noise: float = 0.0):
        return cls(gan_weight=jnp.asarray(gan_weight, jnp.float32),
                   d_lr_scale=jnp.asarray(d_lr_scale, jnp.float32),
                   d_every=jnp.asarray(d_every, jnp.int32),
                   instance_noise=jnp.asarray(instance_noise, jnp.float32))


@struct.dataclass
class GANTrainState:
    step: jnp.ndarray
    g: TrainState
    d_params: Any
    d_opt_state: Any
    balance: GANBalance


def make_gan_train_step(g_apply: Callable, d_apply: Callable,
                        g_tx, d_tx, cfg: TrainConfig,
                        pixel_weight: float = 1e-2,
                        percep_loss: Optional[Callable] = None,
                        noise_seed: int = 0):
    """ESRGAN objective: L_G = percep + λ·RaGAN + η·L1; alternating D step.

    The balance knobs live in ``state.balance`` (:class:`GANBalance`) — a
    saturating discriminator (d_loss → 0) starves the generator of
    adversarial gradient, and the knobs that prevent that (weaker/rarer D
    updates, instance noise on D inputs keeping the real/fake supports
    overlapping — Sønderby et al. 2016) need retuning without recompiles.
    ``balance.gan_weight=0`` is the perceptual-only ablation: the D still
    trains, but contributes no gradient to G.
    """
    from .losses import l1_loss, ragan_discriminator_loss, ragan_generator_loss

    base_key = jax.random.PRNGKey(noise_seed)

    def step(state: GANTrainState, lr, hr):
        bal = state.balance
        key = jax.random.fold_in(base_key, state.step)
        kg, kd = jax.random.split(key)

        def noisy(x, key):
            return x + bal.instance_noise * jax.random.normal(
                key, x.shape, x.dtype)

        def g_loss_fn(g_params, lr, hr, key):
            sr = g_apply(g_params, lr)
            kf, kr = jax.random.split(key)
            fake_logits = d_apply(state.d_params, noisy(sr, kf))
            real_logits = d_apply(state.d_params, noisy(hr, kr))
            g_gan = ragan_generator_loss(real_logits, fake_logits)
            loss = bal.gan_weight * g_gan
            loss = loss + pixel_weight * l1_loss(sr, hr)
            if percep_loss is not None:
                loss = loss + percep_loss(sr, hr)
            return loss, (sr, g_gan)

        def d_loss_fn(d_params, sr, hr, key):
            kf, kr = jax.random.split(key)
            fake_logits = d_apply(d_params,
                                  noisy(jax.lax.stop_gradient(sr), kf))
            real_logits = d_apply(d_params, noisy(hr, kr))
            return ragan_discriminator_loss(real_logits, fake_logits)

        (g_loss, (sr, g_gan)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g.params, lr, hr, kg)
        g_updates, g_opt = g_tx.update(g_grads, state.g.opt_state,
                                       state.g.params)
        g_params = optax.apply_updates(state.g.params, g_updates)
        ema = ema_update(state.g.ema_params, g_params, cfg.ema_decay)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
            state.d_params, sr, hr, kd)

        # D update gated + scaled at runtime: scale==0 on skipped steps,
        # and the optimizer state freezes with the params (same semantics
        # as the step-skipping lax.cond this replaces, but d_every/
        # d_lr_scale are now traced values, not compile-time constants).
        do_d = (state.step % bal.d_every) == 0
        d_updates, d_opt_new = d_tx.update(d_grads, state.d_opt_state,
                                           state.d_params)
        scale = jnp.where(do_d, bal.d_lr_scale, 0.0)
        d_params = jax.tree.map(lambda p, u: p + scale * u,
                                state.d_params, d_updates)
        d_opt = jax.tree.map(lambda new, old: jnp.where(do_d, new, old),
                             d_opt_new, state.d_opt_state)

        new_state = GANTrainState(
            step=state.step + 1,
            g=TrainState(step=state.g.step + 1, params=g_params,
                         opt_state=g_opt, ema_params=ema),
            d_params=d_params, d_opt_state=d_opt, balance=bal)
        metrics = {"g_loss": g_loss, "d_loss": d_loss, "g_gan": g_gan,
                   "gan_weight": bal.gan_weight, "psnr": psnr(sr, hr)}
        return new_state, metrics

    return step
