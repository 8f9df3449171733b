"""Pipeline parallelism (parallel/pipeline.py): GPipe fill/drain schedule
over a pp mesh axis must match the sequential single-device computation —
forward AND gradients — and compose with data parallelism.

The reference has no pipeline (or any) parallelism (SURVEY.md §2); these
tests validate the new TPU-native pp design on the 8-virtual-device CPU
mesh exactly as dryrun_multichip does.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enph459_super_resolution_tpu.models.common import ResBlock
from enph459_super_resolution_tpu.parallel import make_mesh
from enph459_super_resolution_tpu.parallel.pipeline import (
    pipeline_apply,
    shard_params_pp,
    stack_stages,
)

FEATS = 8


def _make_stages(n_stages: int, blocks_per_stage: int = 2, feats: int = FEATS):
    """n_stages independent stacks of resblocks + a stage_fn applying one."""
    block = ResBlock(features=feats)
    x0 = jnp.zeros((1, 4, 4, feats), jnp.float32)

    def init_stage(seed):
        return [block.init(jax.random.PRNGKey(seed * 100 + k), x0)
                for k in range(blocks_per_stage)]

    stages = [init_stage(s) for s in range(n_stages)]

    def stage_fn(params, u):
        for k in range(blocks_per_stage):
            u = block.apply(jax.tree.map(lambda a: a[k], params), u)
        return u

    # stack blocks within a stage, then stages on a new leading axis
    per_stage = [jax.tree.map(lambda *xs: jnp.stack(xs, 0), *s)
                 for s in stages]
    stacked = stack_stages(per_stage)
    return stage_fn, per_stage, stacked


def _sequential(stage_fn, per_stage, x):
    for p in per_stage:
        x = stage_fn(p, x)
    return x


@pytest.mark.parametrize("n_micro", [4, 8])
def test_pipeline_forward_matches_sequential(n_micro):
    pp = 4
    mesh = make_mesh({"pp": pp}, devices=jax.devices()[:pp])
    stage_fn, per_stage, stacked = _make_stages(pp)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 4, 4, FEATS)), jnp.float32)

    got = pipeline_apply(stage_fn, shard_params_pp(stacked, mesh), x,
                         mesh=mesh, n_micro=n_micro)
    want = _sequential(stage_fn, per_stage, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_gradients_match_sequential():
    """jax.grad through the pipeline = the backward pipeline; grads w.r.t.
    stage params and input must equal the sequential computation's."""
    pp = 4
    mesh = make_mesh({"pp": pp}, devices=jax.devices()[:pp])
    stage_fn, per_stage, stacked = _make_stages(pp, blocks_per_stage=1)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 4, 4, FEATS)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=x.shape), jnp.float32)

    def loss_pp(stacked, x):
        y = pipeline_apply(stage_fn, stacked, x, mesh=mesh, n_micro=4)
        return jnp.mean((y - tgt) ** 2)

    def loss_seq(stacked, x):
        y = x
        for s in range(pp):
            y = stage_fn(jax.tree.map(lambda a: a[s], stacked), y)
        return jnp.mean((y - tgt) ** 2)

    g_pp = jax.jit(jax.grad(loss_pp, argnums=(0, 1)))(
        shard_params_pp(stacked, mesh), x)
    g_seq = jax.jit(jax.grad(loss_seq, argnums=(0, 1)))(stacked, x)
    for got, want in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)


def test_pipeline_composes_with_dp():
    """dp x pp mesh: microbatches sharded over dp while stages flow over
    pp; result must still equal the sequential computation."""
    mesh = make_mesh({"dp": 2, "pp": 4}, devices=jax.devices()[:8])
    stage_fn, per_stage, stacked = _make_stages(4)
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(8, 4, 4, FEATS)), jnp.float32)

    got = pipeline_apply(stage_fn, shard_params_pp(stacked, mesh), x,
                         mesh=mesh, n_micro=4, dp_axis="dp")
    want = _sequential(stage_fn, per_stage, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_trains_a_split_model():
    """A head + pipelined trunk + tail trains end-to-end: one SGD step on a
    dp x pp mesh moves the loss down, and stage grads land on their owners."""
    import flax.linen as nn

    mesh = make_mesh({"dp": 2, "pp": 4}, devices=jax.devices()[:8])
    stage_fn, _, stacked = _make_stages(4, blocks_per_stage=1)
    head = nn.Conv(FEATS, (3, 3))
    tail = nn.Conv(1, (3, 3))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(8, 4, 4, 1)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(8, 4, 4, 1)), jnp.float32)

    params = {
        "head": head.init(jax.random.PRNGKey(0), x),
        "stages": shard_params_pp(stacked, mesh),
        "tail": tail.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 4, 4, FEATS), jnp.float32)),
    }

    def loss_fn(params, x, y):
        h = head.apply(params["head"], x)
        h = pipeline_apply(stage_fn, params["stages"], h, mesh=mesh,
                           n_micro=4, dp_axis="dp")
        out = tail.apply(params["tail"], h)
        return jnp.mean((out - y) ** 2)

    @jax.jit
    def sgd(params, x, y):
        l, g = jax.value_and_grad(loss_fn)(params, x, y)
        return l, jax.tree.map(lambda p, g: p - 0.05 * g, params, g)

    l0, params = sgd(params, x, y)
    l1, params = sgd(params, x, y)
    assert np.isfinite(float(l0)) and float(l1) < float(l0)


def test_pipelined_edsr_apply_matches_model_apply():
    """make_pipelined_edsr_apply (the train.loop --mesh pp forward) computes
    the same function as EDSR(scan_trunk=True).apply on the same params."""
    from enph459_super_resolution_tpu.models import EDSR
    from enph459_super_resolution_tpu.parallel.pipeline import (
        make_pipelined_edsr_apply,
        shard_edsr_pp_params,
    )

    mesh = make_mesh({"dp": 2, "pp": 4}, devices=jax.devices()[:8])
    model = EDSR(scale=2, channels=3, n_resblocks=8, n_feats=8,
                 scan_trunk=True)
    x = jnp.asarray(
        np.random.default_rng(5).uniform(0, 255, (8, 6, 6, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x[:1])
    want = model.apply(params, x)

    apply = make_pipelined_edsr_apply(model, mesh, dp_axis="dp")
    got = jax.jit(apply)(shard_edsr_pp_params(params, mesh), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-3)
