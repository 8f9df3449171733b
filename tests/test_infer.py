"""Tiled full-image inference: exactness vs whole-image apply, sharded
variant parity, and the batched classical solve."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enph459_super_resolution_tpu.models import EDSR, ESPCN
from enph459_super_resolution_tpu.models.infer import (
    receptive_field_radius, tiled_infer, tiled_infer_sharded,
)

RNG = np.random.default_rng(21)


@pytest.fixture(scope="module")
def espcn_setup():
    model = ESPCN(scale=2, channels=3)
    lr = jnp.asarray(RNG.uniform(0, 255, (40, 56, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), lr[None])
    return model, params, lr


def test_tiled_equals_whole_image(espcn_setup):
    model, params, lr = espcn_setup
    want = np.asarray(model.apply(params, lr[None])[0])
    got = tiled_infer(model, params, lr, tile=16)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_tiled_nondivisible_image(espcn_setup):
    model, params, _ = espcn_setup
    lr = jnp.asarray(RNG.uniform(0, 255, (37, 51, 3)), jnp.float32)
    want = np.asarray(model.apply(params, lr[None])[0])
    got = tiled_infer(model, params, lr, tile=16)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_tiled_edsr_small():
    model = EDSR(scale=2, channels=3, n_resblocks=2, n_feats=8)
    lr = jnp.asarray(RNG.uniform(0, 255, (32, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), lr[None])
    want = np.asarray(model.apply(params, lr[None])[0])
    got = tiled_infer(model, params, lr, tile=16)
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_tiled_sharded_matches_interior(espcn_setup):
    """SPMD variant: every device's interior matches the whole-image apply;
    only the halo*scale rows at the two GLOBAL image edges may differ (the
    zero-filled edge halo is not identical to SAME-conv boundary handling
    across nonlinearities — documented in models.infer)."""
    from enph459_super_resolution_tpu.parallel import make_mesh
    from enph459_super_resolution_tpu.models.infer import (
        receptive_field_radius,
    )

    model, params, _ = espcn_setup
    mesh = make_mesh({"sp": 4}, devices=jax.devices()[:4])
    lr = jnp.asarray(RNG.uniform(0, 255, (64, 48, 3)), jnp.float32)
    want = np.asarray(model.apply(params, lr[None])[0])
    got = np.asarray(tiled_infer_sharded(model, params, lr, mesh))
    b = receptive_field_radius(model) * 2
    np.testing.assert_allclose(got[b:-b], want[b:-b], atol=2e-3)


def test_receptive_field_radius_known_models():
    # conservative (>= true radius): ESPCN true radius is (5+3+3-3)//2 = 4
    assert receptive_field_radius(ESPCN()) >= 4
    # EDSR n=2: 1 head + 4 body + 1 tail + 1 upsample 3x3 convs = 7 minimum
    assert receptive_field_radius(EDSR(n_resblocks=2)) >= 7


def test_solve_batch_matches_loop():
    from enph459_super_resolution_tpu.sr import make_gaussian_psf, solve
    from enph459_super_resolution_tpu.sr.classical import solve_batch

    psf = make_gaussian_psf()
    shifts = ((0.5, -0.5), (0.5, 0.5), (-0.5, -0.5), (-0.5, 0.5))
    stacks = jnp.asarray(RNG.uniform(0, 255, (3, 4, 32, 40)), jnp.float32)
    batched = solve_batch(stacks, psf, shifts, n_iter=4)
    for r in range(3):
        single = solve(stacks[r], psf, shifts, n_iter=4)
        for k in ("native", "saa", "ibp", "mse_history"):
            np.testing.assert_allclose(np.asarray(batched[k][r]),
                                       np.asarray(single[k]), atol=2e-4,
                                       rtol=1e-5)
