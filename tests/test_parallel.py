"""Mesh-parallel tests on the virtual 8-device CPU mesh.

Validates the halo-exchange machinery, exact tiled inference, sharded IBP
interior parity vs the single-device solve, and the sharded train step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enph459_super_resolution_tpu.parallel import (
    halo_exchange, make_mesh, shard_train_step, sharded_ibp, tiled_apply,
)
from enph459_super_resolution_tpu.sr import ibp, make_gaussian_psf, shift_and_add

SHIFTS = ((+0.5, -0.5), (+0.5, +0.5), (-0.5, -0.5), (-0.5, +0.5))


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return make_mesh({"sp": 8})


def test_halo_exchange_matches_manual(mesh8):
    from jax.sharding import NamedSharding, PartitionSpec as P
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(64, 16)), jnp.float32)
    halo = 3

    fn = jax.shard_map(
        lambda t: halo_exchange(t, halo, "sp", 0),
        mesh=mesh8, in_specs=(P("sp", None),), out_specs=P("sp", None))
    out = np.asarray(fn(jax.device_put(x, NamedSharding(mesh8, P("sp", None)))))

    # manual: per tile, rows [start-halo, end+halo) of the edge-padded image
    xp = np.pad(np.asarray(x), ((halo, halo), (0, 0)), mode="edge")
    tiles = []
    for t in range(8):
        tiles.append(xp[t * 8: t * 8 + 8 + 2 * halo])
    want = np.concatenate(tiles, axis=0)
    np.testing.assert_array_equal(out, want)


def test_tiled_apply_exact_conv(mesh8):
    """A local op (5x5 box blur) applied tiled must equal the global op."""
    from enph459_super_resolution_tpu.ops import correlate2d_same
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 255, size=(64, 40)), jnp.float32)
    k = np.full((5, 5), 1.0 / 25.0)

    # interior-only comparison: tiled_apply edge-replicates at the global
    # edges while correlate2d_same zero-pads, so compare away from them.
    want = np.asarray(correlate2d_same(img, k))
    got = np.asarray(tiled_apply(lambda t: correlate2d_same(t, k), img,
                                 mesh8, halo=4))
    np.testing.assert_allclose(got[4:-4], want[4:-4], atol=1e-4)


def test_sharded_ibp_matches_single_device():
    """Tile interiors must match the unsharded IBP to float tolerance.

    Geometry: one IBP iteration's influence radius is ~23 LR px (7x7 PSF +
    f32 spline-phase kernels, forward + back), so halo_lr=28 with 32-row
    tiles (128-row image over sp=4) keeps interiors exact.
    """
    mesh = make_mesh({"sp": 4}, devices=jax.devices()[:4])
    rng = np.random.default_rng(2)
    psf = make_gaussian_psf()
    lrs = jnp.asarray(rng.uniform(0, 255, size=(4, 128, 48)), jnp.float32)

    hr0 = shift_and_add(lrs, SHIFTS, 2)
    want_hr, want_errs = ibp(lrs, SHIFTS, psf, hr0, 2, n_iter=6, step=0.5)

    got_hr, got_errs = sharded_ibp(lrs, hr0, psf, SHIFTS, mesh,
                                   factor=2, n_iter=6, step=0.5, halo_lr=28)
    np.testing.assert_allclose(np.asarray(got_errs), np.asarray(want_errs),
                               rtol=1e-5)
    # FULL-array parity, global edges included: the per-stage edge-halo
    # fixups reproduce the unsharded boundary condition exactly.
    np.testing.assert_allclose(np.asarray(got_hr), np.asarray(want_hr),
                               atol=1e-3)


def test_sharded_train_step_runs_and_learns():
    from enph459_super_resolution_tpu.models import ESPCN
    from enph459_super_resolution_tpu.train import (
        TrainConfig, TrainState, make_optimizer, make_train_step,
    )
    mesh = make_mesh({"dp": 8})
    model = ESPCN(scale=2, channels=1)
    rng = np.random.default_rng(3)
    lr = jnp.asarray(rng.uniform(0, 1, (8, 8, 8, 1)), jnp.float32)
    hr = jnp.repeat(jnp.repeat(lr, 2, axis=1), 2, axis=2)  # nearest GT
    params = model.init(jax.random.PRNGKey(0), lr)
    cfg = TrainConfig(learning_rate=3e-3, loss="l1")
    tx = make_optimizer(cfg)
    state = TrainState.create(params, tx)
    step = shard_train_step(make_train_step(model.apply, tx, cfg), mesh)
    state, m0 = step(state, lr, hr)
    l0 = float(m0["loss"])
    for _ in range(30):
        state, m = step(state, lr, hr)
    assert float(m["loss"]) < l0 * 0.7


def test_solve_sharded_matches_single_device():
    from enph459_super_resolution_tpu.parallel import solve_sharded
    from enph459_super_resolution_tpu.sr import solve

    mesh = make_mesh({"sp": 4}, devices=jax.devices()[:4])
    rng = np.random.default_rng(5)
    psf = make_gaussian_psf()
    lrs = jnp.asarray(rng.uniform(0, 255, size=(4, 128, 48)), jnp.float32)

    want = solve(lrs, psf, SHIFTS, n_iter=6)
    got = solve_sharded(lrs, psf, SHIFTS, mesh, n_iter=6, halo_lr=28)
    for k in ("native", "saa"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   atol=1e-4)
    # IBP: full-array parity including the global edges
    np.testing.assert_allclose(np.asarray(got["ibp"]),
                               np.asarray(want["ibp"]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(got["mse_history"]),
                               np.asarray(want["mse_history"]), rtol=1e-5)


def test_sharded_adjoint_matches_unsharded_adjoint(monkeypatch):
    """sharded_ibp(solver='adjoint') — the true adjoint taken as the vjp of
    the per-tile patched forward — must match the unsharded adjoint solve
    (transposed banded operators, sr.classical SRTPU_SOLVER=adjoint) over
    the FULL array, global edges included."""
    from enph459_super_resolution_tpu.sr.classical import solve

    mesh = make_mesh({"sp": 4}, devices=jax.devices()[:4])
    rng = np.random.default_rng(4)
    psf = make_gaussian_psf()
    lrs = jnp.asarray(rng.uniform(0, 255, size=(4, 128, 48)), jnp.float32)
    hr0 = shift_and_add(lrs, SHIFTS, 2)

    monkeypatch.setenv("SRTPU_SOLVER", "adjoint")
    want = solve(lrs, psf, SHIFTS, n_iter=6, step=2.0)

    got_hr, got_errs = sharded_ibp(lrs, hr0, psf, SHIFTS, mesh,
                                   factor=2, n_iter=6, step=2.0,
                                   halo_lr=28, solver="adjoint")
    np.testing.assert_allclose(np.asarray(got_errs),
                               np.asarray(want["mse_history"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_hr),
                               np.asarray(want["ibp"]), atol=1e-3)


# ---------------------------------------------------------------------------
# 2-D (H x W) spatial sharding
# ---------------------------------------------------------------------------

def test_parse_sp_spec():
    from enph459_super_resolution_tpu.parallel.mesh import parse_sp_spec
    assert parse_sp_spec(4) == (4, 1)
    assert parse_sp_spec("8") == (8, 1)
    assert parse_sp_spec("4x2") == (4, 2)
    assert parse_sp_spec((2, 2)) == (2, 2)
    for bad in ("4x2x2", "ax2", "0", "4x0", "-1"):
        with pytest.raises(ValueError):
            parse_sp_spec(bad)


def test_tiled_apply_2d_exact_conv(mesh8):
    """tiled_apply over an H x W mesh (corner exchange via sequenced 1-D
    exchanges) must equal the global op away from the global edges."""
    from enph459_super_resolution_tpu.ops import correlate2d_same
    mesh = make_mesh({"sp": 2, "spw": 2}, devices=jax.devices()[:4])
    rng = np.random.default_rng(6)
    img = jnp.asarray(rng.uniform(0, 255, size=(64, 40)), jnp.float32)
    k = np.full((5, 5), 1.0 / 25.0)

    want = np.asarray(correlate2d_same(img, k))
    got = np.asarray(tiled_apply(lambda t: correlate2d_same(t, k), img,
                                 mesh, halo=4, sp_axis=("sp", "spw"),
                                 axis=-2))
    np.testing.assert_allclose(got[4:-4, 4:-4], want[4:-4, 4:-4], atol=1e-4)


@pytest.mark.parametrize("layout", [(2, 2), (4, 2)])
def test_sharded_ibp_2d_matches_single_device(layout):
    """H x W tiled IBP: full-array parity with the unsharded solve,
    global edges AND corners included (the per-stage halo fixups patch
    H before W, realizing SciPy's separable 'nearest' corner)."""
    sph, spw = layout
    mesh = make_mesh({"sp": sph, "spw": spw},
                     devices=jax.devices()[:sph * spw])
    rng = np.random.default_rng(7)
    psf = make_gaussian_psf()
    lrs = jnp.asarray(rng.uniform(0, 255, size=(4, 128, 64)), jnp.float32)

    hr0 = shift_and_add(lrs, SHIFTS, 2)
    want_hr, want_errs = ibp(lrs, SHIFTS, psf, hr0, 2, n_iter=6, step=0.5)
    got_hr, got_errs = sharded_ibp(lrs, hr0, psf, SHIFTS, mesh,
                                   factor=2, n_iter=6, step=0.5,
                                   halo_lr=28, sp_axis=("sp", "spw"))
    np.testing.assert_allclose(np.asarray(got_errs), np.asarray(want_errs),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_hr), np.asarray(want_hr),
                               atol=1e-3)


def test_sharded_adjoint_2d_matches_unsharded_adjoint(monkeypatch):
    from enph459_super_resolution_tpu.sr.classical import solve

    mesh = make_mesh({"sp": 2, "spw": 2}, devices=jax.devices()[:4])
    rng = np.random.default_rng(8)
    psf = make_gaussian_psf()
    lrs = jnp.asarray(rng.uniform(0, 255, size=(4, 128, 64)), jnp.float32)
    hr0 = shift_and_add(lrs, SHIFTS, 2)

    monkeypatch.setenv("SRTPU_SOLVER", "adjoint")
    want = solve(lrs, psf, SHIFTS, n_iter=6, step=2.0)

    got_hr, got_errs = sharded_ibp(lrs, hr0, psf, SHIFTS, mesh,
                                   factor=2, n_iter=6, step=2.0,
                                   halo_lr=28, sp_axis=("sp", "spw"),
                                   solver="adjoint")
    np.testing.assert_allclose(np.asarray(got_errs),
                               np.asarray(want["mse_history"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_hr),
                               np.asarray(want["ibp"]), atol=1e-3)


def test_solve_sharded_2d_matches_single_device():
    from enph459_super_resolution_tpu.parallel import solve_sharded
    from enph459_super_resolution_tpu.sr import solve

    mesh = make_mesh({"sp": 4, "spw": 2})
    rng = np.random.default_rng(9)
    psf = make_gaussian_psf()
    lrs = jnp.asarray(rng.uniform(0, 255, size=(4, 128, 64)), jnp.float32)

    want = solve(lrs, psf, SHIFTS, n_iter=6)
    got = solve_sharded(lrs, psf, SHIFTS, mesh, n_iter=6, halo_lr=28,
                        sp_axis=("sp", "spw"))
    np.testing.assert_allclose(np.asarray(got["ibp"]),
                               np.asarray(want["ibp"]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(got["mse_history"]),
                               np.asarray(want["mse_history"]), rtol=1e-5)
