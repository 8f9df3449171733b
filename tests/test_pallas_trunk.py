"""Parity tests for the fused residual-trunk Pallas kernel.

Pins ops/pallas_trunk.py against the REAL flax module chain
(models/common.py::ResBlock — the EDSR trunk semantics, flax 'SAME'
zero padding included) in interpret mode on CPU: exact-ish in f32,
tolerance-bounded in bf16.  Geometry edge cases: odd widths, multiple
bands, partial final fuse group, every tap-group size.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enph459_super_resolution_tpu.models.common import ResBlock
from enph459_super_resolution_tpu.ops import pallas_trunk as pt


def _rand_convs(rng, n_blocks):
    convs = []
    for _ in range(2 * n_blocks):
        k = rng.standard_normal((3, 3, 64, 64)).astype(np.float32) * 0.05
        b = rng.standard_normal((64,)).astype(np.float32) * 0.1
        convs.append((k, b))
    return convs


def _flax_ref(x, convs, res_scale, dtype=jnp.float32):
    """Chain the real ResBlock modules with the given weights."""
    block = ResBlock(64, res_scale, dtype=dtype)
    for i in range(0, len(convs), 2):
        params = {"params": {
            "Conv_0": {"kernel": jnp.asarray(convs[i][0]),
                       "bias": jnp.asarray(convs[i][1])},
            "Conv_1": {"kernel": jnp.asarray(convs[i + 1][0]),
                       "bias": jnp.asarray(convs[i + 1][1])},
        }}
        x = block.apply(params, x)
    return x


@pytest.mark.parametrize("g2", [1, 2, 3, 9])
def test_fused_trunk_matches_flax_f32(g2):
    rng = np.random.default_rng(0)
    convs = _rand_convs(rng, 2)
    x = rng.standard_normal((2, 12, 12, 64)).astype(np.float32)
    want = _flax_ref(jnp.asarray(x), convs, 1.0)
    got = pt.fused_resblocks(jnp.asarray(x), convs, fuse=2, band=64,
                             chunk=128, g2=g2, dtype=jnp.float32,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_trunk_odd_width_multiband_partial_group():
    """Odd W (stride forced even), several bands, 3 blocks at fuse=2
    (partial final group -> repack), res_scale != 1."""
    rng = np.random.default_rng(1)
    convs = _rand_convs(rng, 3)
    x = rng.standard_normal((1, 9, 11, 64)).astype(np.float32)
    want = _flax_ref(jnp.asarray(x), convs, 0.1)
    got = pt.fused_resblocks(jnp.asarray(x), convs, res_scale=0.1,
                             fuse=2, band=24, chunk=64,
                             dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_trunk_bf16_tracks_f32():
    rng = np.random.default_rng(2)
    convs = _rand_convs(rng, 2)
    x = rng.standard_normal((1, 16, 14, 64)).astype(np.float32)
    want = np.asarray(_flax_ref(jnp.asarray(x), convs, 1.0))
    got = np.asarray(pt.fused_resblocks(
        jnp.asarray(x), convs, fuse=2, band=128, chunk=128, g2=2,
        dtype=jnp.bfloat16, interpret=True)).astype(np.float32)
    # bf16 trunk vs f32 reference: rounding-level agreement only
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 0.05 * scale


def test_edsr_fused_apply_matches_flax():
    """models/fused.py::make_edsr_fused_apply vs EDSR.apply, f32 exact-ish
    (same params, same mean shift, head/tail/upsampler in XLA)."""
    from enph459_super_resolution_tpu.models import fused
    from enph459_super_resolution_tpu.models.zoo import EDSR

    model = EDSR(scale=4, channels=3, n_resblocks=2, n_feats=64,
                 dtype=jnp.float32)
    rng = np.random.default_rng(4)
    x = (rng.random((1, 10, 12, 3)) * 255).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    want = np.asarray(model.apply(params, jnp.asarray(x)))
    fn = fused.make_edsr_fused_apply(
        model, params, band=64, chunk=128, g2=2, fuse=2, wstrip=None,
        dtype=jnp.float32, interpret=True, jit=False)
    got = np.asarray(fn(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_edsr_fused_apply_wstrip_exact():
    """Vertical-strip decomposition (wide W) is exact vs the unstripped
    fused path in f32."""
    from enph459_super_resolution_tpu.models import fused
    from enph459_super_resolution_tpu.models.zoo import EDSR

    model = EDSR(scale=2, channels=1, n_resblocks=2, n_feats=64,
                 dtype=jnp.float32)
    rng = np.random.default_rng(5)
    x = (rng.random((1, 8, 40, 1)) * 255).astype(np.float32)
    params = model.init(jax.random.PRNGKey(1), jnp.asarray(x))
    want = np.asarray(model.apply(params, jnp.asarray(x)))
    fn = fused.make_edsr_fused_apply(
        model, params, band=64, chunk=128, g2=2, fuse=2, wstrip=16,
        dtype=jnp.float32, interpret=True, jit=False)
    got = np.asarray(fn(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_burst_lr_fused_apply_matches_flax():
    from enph459_super_resolution_tpu.models import fused
    from enph459_super_resolution_tpu.models.zoo import BurstFusionLR

    model = BurstFusionLR(n_frames=3, factor=2, n_feats=64, n_resblocks=2,
                          dtype=jnp.float32)
    rng = np.random.default_rng(6)
    x = (rng.random((2, 8, 10, 12)) * 255).astype(np.float32)
    params = model.init(jax.random.PRNGKey(2), jnp.asarray(x))
    want = np.asarray(model.apply(params, jnp.asarray(x)))
    fn = fused.make_burst_lr_fused_apply(
        model, params, band=64, chunk=128, g2=2, fuse=2, wstrip=None,
        dtype=jnp.float32, interpret=True, jit=False)
    got = np.asarray(fn(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_pack_trunk_groups():
    rng = np.random.default_rng(3)
    convs = _rand_convs(rng, 5)
    packed = pt.pack_trunk(convs, g2=2, fuse=2)
    assert [nb for _, _, nb in packed] == [2, 2, 1]
    w, b, _ = packed[0]
    assert w.shape == (4, 5, 256, 128) and w.dtype == jnp.bfloat16
    assert b.shape == (4, 1, 128) and b.dtype == jnp.float32
    # packed bias duplicates the 64-vector across both pixel halves
    np.testing.assert_array_equal(np.asarray(b)[0, 0, :64],
                                  np.asarray(b)[0, 0, 64:])
