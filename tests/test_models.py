"""Model zoo shape/finiteness tests + a tiny training-convergence check."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enph459_super_resolution_tpu.models import (
    EDSR, ESPCN, FSRCNN, RRDBNet, SRCNN, VGGStyleDiscriminator, pixel_shuffle,
)
from enph459_super_resolution_tpu.train import (
    TrainConfig, TrainState, make_optimizer, make_train_step,
)

KEY = jax.random.PRNGKey(0)


def test_pixel_shuffle_layout():
    # depth_to_space must interleave: channel (ry*r + rx)*C + c -> offset (ry, rx)
    x = jnp.arange(1 * 2 * 2 * 4, dtype=jnp.float32).reshape(1, 2, 2, 4)
    y = pixel_shuffle(x, 2)
    assert y.shape == (1, 4, 4, 1)
    # top-left 2x2 block of output comes from input pixel (0,0)'s 4 channels
    np.testing.assert_array_equal(np.asarray(y[0, :2, :2, 0]),
                                  [[0, 1], [2, 3]])


@pytest.mark.parametrize("model,scale,channels", [
    (SRCNN(channels=1), 1, 1),
    (ESPCN(scale=4, channels=1), 4, 1),
    (FSRCNN(scale=4, channels=1), 4, 1),
    (EDSR(scale=4, channels=3, n_resblocks=2, n_feats=8), 4, 3),
    (RRDBNet(scale=4, channels=3, nf=8, nb=1, gc=4), 4, 3),
])
def test_model_shapes(model, scale, channels):
    lr = jnp.ones((2, 12, 16, channels), jnp.float32) * 100.0
    params = model.init(KEY, lr)
    out = jax.jit(model.apply)(params, lr)
    assert out.shape == (2, 12 * scale, 16 * scale, channels)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_discriminator_shape():
    d = VGGStyleDiscriminator(nf=8)
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    params = d.init(KEY, x)
    out = d.apply(params, x)
    assert out.shape == (2, 1)


def test_train_step_reduces_loss():
    """SRCNN on a trivial identity-ish task: loss must drop markedly."""
    model = SRCNN(channels=1, f1=8, f2=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (4, 16, 16, 1)), jnp.float32)
    y = x  # learn identity
    params = model.init(KEY, x)
    cfg = TrainConfig(learning_rate=1e-3, loss="l2", ema_decay=0.9)
    tx = make_optimizer(cfg)
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(model.apply, tx, cfg))
    state, m0 = step(state, x, y)
    for _ in range(60):
        state, m = step(state, x, y)
    assert float(m["loss"]) < float(m0["loss"]) * 0.2
    assert int(state.step) == 61
    # EMA params exist and differ from raw params (decay < 1)
    diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        state.params, state.ema_params)
    assert max(jax.tree.leaves(diff)) > 0
