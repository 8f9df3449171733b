"""Expert parallelism (parallel/moe.py): expert-sharded soft-gated MoE must
match the dense single-device evaluation — forward and gradients — and
compose with data parallelism, on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enph459_super_resolution_tpu.models.common import ResBlock
from enph459_super_resolution_tpu.parallel import make_mesh
from enph459_super_resolution_tpu.parallel.moe import (
    moe_apply,
    shard_params_ep,
    stack_experts,
)

FEATS = 8
E = 4


def _setup(seed=0):
    block = ResBlock(features=FEATS)
    x0 = jnp.zeros((1, 4, 4, FEATS), jnp.float32)
    experts = [block.init(jax.random.PRNGKey(seed * 10 + e), x0)
               for e in range(E)]
    stacked = stack_experts(experts)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(8, 4, 4, FEATS)), jnp.float32)
    gates = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(8, 4, 4, E)), jnp.float32), axis=-1)
    return block, stacked, gates, x


def _dense(block, stacked, gates, x):
    ys = jnp.stack([
        block.apply(jax.tree.map(lambda a: a[e], stacked), x)
        for e in range(E)], axis=-1)           # [B,H,W,C,E]
    return jnp.sum(ys * gates[..., None, :], axis=-1)


@pytest.mark.parametrize("axes", [{"ep": 4}, {"dp": 2, "ep": 4}])
def test_moe_forward_matches_dense(axes):
    block, stacked, gates, x = _setup()
    ndev = int(np.prod(list(axes.values())))
    mesh = make_mesh(axes, devices=jax.devices()[:ndev])
    dp = "dp" if "dp" in axes else None
    got = moe_apply(block.apply, shard_params_ep(stacked, mesh), gates, x,
                    mesh=mesh, dp_axis=dp)
    want = _dense(block, stacked, gates, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_moe_gradients_match_dense():
    block, stacked, gates, x = _setup(1)
    mesh = make_mesh({"ep": 4}, devices=jax.devices()[:4])
    tgt = jnp.asarray(
        np.random.default_rng(9).normal(size=x.shape), jnp.float32)

    def loss_ep(stacked, gates):
        y = moe_apply(block.apply, stacked, gates, x, mesh=mesh)
        return jnp.mean((y - tgt) ** 2)

    def loss_dense(stacked, gates):
        return jnp.mean((_dense(block, stacked, gates, x) - tgt) ** 2)

    g_ep = jax.jit(jax.grad(loss_ep, argnums=(0, 1)))(
        shard_params_ep(stacked, mesh), gates)
    g_dense = jax.jit(jax.grad(loss_dense, argnums=(0, 1)))(stacked, gates)
    for got, want in zip(jax.tree.leaves(g_ep), jax.tree.leaves(g_dense)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)


def test_moe_trains_gate_and_experts():
    """Head + gated expert layer + tail trains end-to-end on a dp x ep
    mesh: the learned gate's logits move (routing is trained, not fixed)
    and the loss goes down."""
    import flax.linen as nn

    mesh = make_mesh({"dp": 2, "ep": 4}, devices=jax.devices()[:8])
    block, stacked, _, _ = _setup(2)
    head = nn.Conv(FEATS, (3, 3))
    gate = nn.Conv(E, (1, 1))
    tail = nn.Conv(1, (3, 3))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(8, 4, 4, 1)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(8, 4, 4, 1)), jnp.float32)
    zf = jnp.zeros((1, 4, 4, FEATS), jnp.float32)

    params = {
        "head": head.init(jax.random.PRNGKey(0), x),
        "gate": gate.init(jax.random.PRNGKey(1), zf),
        "experts": shard_params_ep(stacked, mesh),
        "tail": tail.init(jax.random.PRNGKey(2), zf),
    }

    def loss_fn(p, x, y):
        h = head.apply(p["head"], x)
        g = jax.nn.softmax(gate.apply(p["gate"], h), axis=-1)
        h = moe_apply(block.apply, p["experts"], g, h, mesh=mesh,
                      dp_axis="dp")
        return jnp.mean((tail.apply(p["tail"], h) - y) ** 2)

    @jax.jit
    def sgd(p, x, y):
        l, g = jax.value_and_grad(loss_fn)(p, x, y)
        return l, jax.tree.map(lambda a, b: a - 0.05 * b, p, g)

    g0 = jax.device_get(params["gate"])
    l0, params = sgd(params, x, y)
    l1, params = sgd(params, x, y)
    assert np.isfinite(float(l0)) and float(l1) < float(l0)
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        g0, jax.device_get(params["gate"]))
    assert max(jax.tree.leaves(moved)) > 0, "gate params did not train"


# ---------------------------------------------------------------------------
# product surface: models.zoo.EDSRMoE + train.loop --mesh "dp=2,ep=4"
# ---------------------------------------------------------------------------

def test_edsr_moe_ep_sharded_apply_matches_dense():
    """The zoo MoE trunk under jit with expert params sharded over ep must
    equal the dense single-device evaluation (GSPMD computes E/ep expert
    branches per device + one psum — moe_apply's schedule, jit-native)."""
    from enph459_super_resolution_tpu.models import create_model
    from enph459_super_resolution_tpu.parallel.moe import shard_params_ep_named

    m = create_model("edsr_moe", scale=2, channels=1, n_resblocks=2,
                     n_feats=8, n_experts=4)
    x = jnp.asarray(np.random.default_rng(3).uniform(0, 255, (2, 8, 8, 1)),
                    jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x)
    want = m.apply(p, x)

    mesh = make_mesh({"dp": 2, "ep": 4})
    p_ep = shard_params_ep_named(p, mesh, "ep")
    # the expert stacks (2 blocks x conv kernel+bias x 2) must actually be
    # ep-sharded, everything else replicated
    n_sharded = sum(1 for leaf in jax.tree.leaves(p_ep)
                    if "ep" in tuple(leaf.sharding.spec))
    assert n_sharded == 8
    got = jax.jit(m.apply)(p_ep, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_edsr_moe_trains_ep_with_loss_parity(tmp_path):
    """train.loop --model edsr_moe --mesh "dp=2,ep=4" must follow the
    single-device dense trajectory (same seed -> same batches -> same math,
    GSPMD-partitioned) — the pipeline-parallel acceptance standard."""
    import json
    from enph459_super_resolution_tpu.train.loop import train

    common = dict(model_name="edsr_moe", scale=2, steps=4, batch=4,
                  lr_patch=8, channels=1, eval_every=100, ckpt_every=100,
                  pool_images=8, seed=0, resume=False,
                  model_kwargs={"n_resblocks": 2, "n_feats": 8,
                                "n_experts": 4})
    dense = train(out_dir=str(tmp_path / "dense"), dp=False, **common)
    ep = train(out_dir=str(tmp_path / "ep"), mesh_spec="dp=2,ep=4", **common)

    def losses(d):
        with open(tmp_path / d / "metrics.jsonl") as fp:
            return [json.loads(l)["loss"] for l in fp]

    np.testing.assert_allclose(losses("ep"), losses("dense"),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ep["psnr"], dense["psnr"], atol=1e-3)


def test_edsr_moe_ep_rejects_bad_configs(tmp_path):
    from enph459_super_resolution_tpu.train.loop import train

    with pytest.raises(ValueError, match="edsr_moe"):
        train(model_name="edsr", steps=1, mesh_spec="ep=4",
              out_dir=str(tmp_path / "a"))
    with pytest.raises(ValueError, match="divisible"):
        train(model_name="edsr_moe", steps=1, mesh_spec="ep=4",
              model_kwargs={"n_experts": 3}, out_dir=str(tmp_path / "b"))
