"""Pallas banded-kernel correctness (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enph459_super_resolution_tpu.ops.opmatrix import (
    BandedOp, shift_op_matrix, stuff_shift_op_matrix,
)
from enph459_super_resolution_tpu.ops.pallas_kernels import (
    banded_row_apply, pack_banded,
)

RNG = np.random.default_rng(3)


@pytest.mark.parametrize("case", ["fwd_stride", "bwd_stuff", "plain_shift"])
def test_pallas_banded_row_matches_xla(case):
    if case == "fwd_stride":
        m = shift_op_matrix(2048, 1.0, stride=2, n_out=1024,
                            blur_taps=tuple(np.random.rand(7)),
                            dtype_name="float32")
    elif case == "bwd_stuff":
        m = stuff_shift_op_matrix(1024, 2, -1.0,
                                  blur_taps=tuple(np.random.rand(7)),
                                  dtype_name="float32")
    else:
        m = shift_op_matrix(2048, 0.37, dtype_name="float32")
    op = BandedOp.from_matrix(m)
    x = jnp.asarray(RNG.uniform(0, 255, (2048 if case != "bwd_stuff" else
                                         1024, 1024)), jnp.float32)
    want = np.asarray(op.row_apply(x))
    got = np.asarray(banded_row_apply(op, x, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_pack_banded_alignment_and_coverage():
    m = shift_op_matrix(2048, 1.0, stride=2, n_out=1024,
                        blur_taps=tuple(np.random.rand(7)),
                        dtype_name="float32")
    op = BandedOp.from_matrix(m)
    starts, bands, blk = pack_banded(op)
    assert (starts % 8 == 0).all()
    assert bands.shape[-1] % 128 == 0
    assert (starts + bands.shape[-1] <= op.n_in).all()
    # packed representation reproduces the dense matrix exactly
    dense = np.zeros((len(op.blocks) * blk, op.n_in), dtype=np.float32)
    for i in range(len(op.blocks)):
        dense[i * blk:(i + 1) * blk,
              starts[i]:starts[i] + bands.shape[-1]] += bands[i]
    np.testing.assert_array_equal(dense[:op.n_out], m)


def test_packed_pytree_roundtrip():
    m = shift_op_matrix(2048, 0.5, dtype_name="float32")
    op = BandedOp.from_matrix(m, pack_pallas=True)
    assert op.packed is not None
    leaves, treedef = jax.tree.flatten(op)
    op2 = jax.tree.unflatten(treedef, leaves)
    assert op2.packed is not None and len(op2.packed) == 2
    assert op2.col_ranges == op.col_ranges


def test_pack_banded_non_multiple_of_align():
    """Regression: window clamping must not overflow when n_in % 8 != 0."""
    m = shift_op_matrix(1001, 0.5, dtype_name="float32")  # odd n_in
    op = BandedOp.from_matrix(m, block=256)
    starts, bands, blk = pack_banded(op)
    assert (starts % 8 == 0).all()
    assert (starts + bands.shape[-1] <= op.n_in).all() or \
        bands.shape[-1] >= op.n_in  # tiny inputs degenerate to full width


def test_tiled_op_pallas_matches_xla():
    """BandedOp.tiled (the batched-solve operator) through the Pallas
    kernel must equal per-rep XLA applies — including the packed path."""
    m = shift_op_matrix(512, 1.0, stride=2, n_out=256,
                        blur_taps=tuple(np.random.rand(7)),
                        dtype_name="float32")
    base = BandedOp.from_matrix(m, block=128, pack_pallas=True)
    base_xla = BandedOp.from_matrix(m, block=128, pack_pallas=False)
    assert base.packed is not None
    r = 3
    op = BandedOp.tiled(base, r)
    assert op.packed is not None, "uniform-block tiled op must stay packed"
    x = jnp.asarray(RNG.uniform(0, 255, (r * 512, 512)), jnp.float32)
    got = np.asarray(banded_row_apply(op, x, interpret=True))
    # per-rep reference: apply the base op to each H-slice independently
    for k in range(r):
        want = np.asarray(base_xla.row_apply(x[k * 512:(k + 1) * 512]))
        np.testing.assert_allclose(got[k * 256:(k + 1) * 256], want,
                                   atol=1e-3)


def test_tiled_op_nonuniform_blocks_fall_back():
    """Tiling an op whose last block is shorter must not produce a packed
    (Pallas) form — padded rows would land mid-array."""
    m = shift_op_matrix(500, 0.5, dtype_name="float32")  # 500 % 128 != 0
    base = BandedOp.from_matrix(m, block=128, pack_pallas=True)
    base_xla = BandedOp.from_matrix(m, block=128, pack_pallas=False)
    op = BandedOp.tiled(base, 2)
    assert op.packed is None
    # the XLA path still matches per-rep applies
    x = jnp.asarray(RNG.uniform(0, 255, (1000, 256)), jnp.float32)
    got = np.asarray(op.row_apply(x))
    for k in range(2):
        want = np.asarray(base_xla.row_apply(x[k * 500:(k + 1) * 500]))
        np.testing.assert_allclose(got[k * 500:(k + 1) * 500], want,
                                   atol=1e-3)


# ---------------------------------------------------------------------------
# fused whole-iteration IBP kernels (ops/pallas_fused_ibp.py)
# ---------------------------------------------------------------------------

def _fused_fixture(shifts, h=128, w=256, factor=2, reps=1):
    from enph459_super_resolution_tpu.sr.classical import (
        _frame_operator_matrices, make_gaussian_psf,
    )
    from enph459_super_resolution_tpu.ops.pallas_fused_ibp import FusedIBP

    psf = make_gaussian_psf()
    frame_mats = [_frame_operator_matrices(psf, s, factor, (h, w), "float32")
                  for s in shifts]
    pack = FusedIBP.build(frame_mats, (h, w), (h * factor, w * factor),
                          reps=reps, interpret=True)
    return psf, frame_mats, pack


@pytest.mark.parametrize("reps", [1, 2])
def test_fused_ibp_iteration_matches_unfused(reps):
    """One fused fwd_err + bwd_update == the unfused banded iteration,
    including the rep-tiled (batched-solve) row operators."""
    from enph459_super_resolution_tpu.ops.opmatrix import BandedOp
    from enph459_super_resolution_tpu.sr.classical import (
        back_project_mm, forward_model_mm,
    )

    shifts = ((0.0, 0.0), (0.5, -0.5), (-0.5, 0.5))
    h, w, factor = 128, 256, 2
    psf, frame_mats, pack = _fused_fixture(shifts, h, w, factor, reps)
    n = len(shifts)
    hr = jnp.asarray(RNG.uniform(0, 255, (reps * h * factor, w * factor)),
                     jnp.float32)
    lrs = jnp.asarray(RNG.uniform(0, 255, (n, reps * h, w)), jnp.float32)

    err = np.asarray(pack.fwd_err(hr, lrs))
    hr2 = np.asarray(pack.bwd_update(hr, jnp.asarray(err), 0.5 / n,
                                     (0.0, 255.0)))

    def unfused_ops(ms):
        return tuple([BandedOp.tiled(BandedOp.from_matrix(m, block=128,
                                                          pack_pallas=False),
                                     reps) if axis % 2 == 0 else
                      BandedOp.from_matrix(m, block=128, pack_pallas=False)
                      for m in mlist]
                     for axis, mlist in enumerate(ms))

    corr = np.zeros_like(np.asarray(hr))
    for i, s in enumerate(shifts):
        mats_i = unfused_ops(frame_mats[i])
        sim = np.asarray(forward_model_mm(hr, mats_i))
        want_err = np.asarray(lrs[i]) - sim
        np.testing.assert_allclose(err[i], want_err, atol=2e-2)
        corr = corr + np.asarray(back_project_mm(jnp.asarray(want_err),
                                                 mats_i))
    want_hr2 = np.clip(np.asarray(hr) + 0.5 * corr / n, 0.0, 255.0)
    np.testing.assert_allclose(hr2, want_hr2, atol=5e-2)


def test_fused_solve_matches_unfused_solve(monkeypatch):
    """Full solve through SRTPU_FUSED_IBP=interpret equals the unfused mm
    engine to f32 reordering tolerance on a conforming shape."""
    from enph459_super_resolution_tpu.sr import classical

    shifts = ((0.5, -0.5), (0.5, 0.5), (-0.5, -0.5), (-0.5, 0.5))
    psf = classical.make_gaussian_psf()
    lrs = jnp.asarray(RNG.uniform(0, 255, (4, 128, 256)), jnp.float32)

    monkeypatch.setenv("SRTPU_FUSED_IBP", "0")
    classical._compiled_solve.cache_clear()
    want = classical.solve(lrs, psf, shifts, n_iter=6)

    monkeypatch.setenv("SRTPU_FUSED_IBP", "interpret")
    classical._compiled_solve.cache_clear()
    got = classical.solve(lrs, psf, shifts, n_iter=6)
    classical._compiled_solve.cache_clear()

    np.testing.assert_allclose(np.asarray(got["ibp"]),
                               np.asarray(want["ibp"]), atol=0.1)
    np.testing.assert_allclose(np.asarray(got["mse_history"]),
                               np.asarray(want["mse_history"]), rtol=1e-4)
    # SAA/native are shared paths — must be identical
    np.testing.assert_array_equal(np.asarray(got["saa"]),
                                  np.asarray(want["saa"]))


def test_fused_low_pack_iteration_close_to_f32():
    """The bf16 band pack (astype_bands) runs the same iteration within
    bf16 rounding of the f32 fused kernels, with a bf16 err stack."""
    shifts = ((0.0, 0.0), (0.5, -0.5), (-0.5, 0.5))
    h, w, factor = 128, 256, 2
    _, _, pack = _fused_fixture(shifts, h, w, factor)
    lo = pack.astype_bands(jnp.bfloat16)
    assert lo.f_bandr.dtype == jnp.bfloat16
    assert lo.b_bandc.dtype == jnp.bfloat16
    assert lo.f_sr.dtype == pack.f_sr.dtype  # starts stay int32

    n = len(shifts)
    hr = jnp.asarray(RNG.uniform(0, 255, (h * factor, w * factor)),
                     jnp.float32)
    lrs = jnp.asarray(RNG.uniform(0, 255, (n, h, w)), jnp.float32)

    err32 = np.asarray(pack.fwd_err(hr, lrs), np.float32)
    err16 = lo.fwd_err(hr, lrs.astype(jnp.bfloat16))
    assert err16.dtype == jnp.bfloat16
    # band entries and images round to 8-bit mantissa: ~1% of the 0..255
    # signal scale
    np.testing.assert_allclose(np.asarray(err16, np.float32), err32,
                               atol=3.0)

    hr32 = np.asarray(pack.bwd_update(hr, jnp.asarray(err32), 0.5 / n,
                                      (0.0, 255.0)))
    hr16 = np.asarray(lo.bwd_update(hr, err16, 0.5 / n, (0.0, 255.0)),
                      np.float32)
    assert hr16.dtype == np.float32  # the HR state stays f32
    np.testing.assert_allclose(hr16, hr32, atol=3.0)


@pytest.mark.parametrize("store", ["hybrid:3", "bf16"])
def test_fused_low_solve_close_to_f32_solve(monkeypatch, store):
    """Full solve through the fused engine with the low band store
    (SRTPU_FUSED_IBP=interpret + SRTPU_BAND_STORE) stays in the bf16
    parity class of the strict f32 banded solve; hybrid's f32 banded tail
    tightens it."""
    from enph459_super_resolution_tpu.sr import classical

    shifts = ((0.5, -0.5), (0.5, 0.5), (-0.5, -0.5), (-0.5, 0.5))
    psf = classical.make_gaussian_psf()
    lrs = jnp.asarray(RNG.uniform(0, 255, (4, 128, 256)), jnp.float32)

    monkeypatch.setenv("SRTPU_FUSED_IBP", "0")
    monkeypatch.setenv("SRTPU_BAND_STORE", "f32")
    classical._compiled_solve.cache_clear()
    want = classical.solve(lrs, psf, shifts, n_iter=6)

    monkeypatch.setenv("SRTPU_FUSED_IBP", "interpret")
    monkeypatch.setenv("SRTPU_BAND_STORE", store)
    classical._compiled_solve.cache_clear()
    got = classical.solve(lrs, psf, shifts, n_iter=6)
    classical._compiled_solve.cache_clear()

    d = np.abs(np.asarray(got["ibp"], np.float32)
               - np.asarray(want["ibp"], np.float32))
    assert d.max() < (1.5 if store.startswith("hybrid") else 3.0)
    du = np.abs(classical.to_uint8(got["ibp"]).astype(int)
                - classical.to_uint8(want["ibp"]).astype(int))
    assert du.max() <= (2 if store.startswith("hybrid") else 3)
    # the one-shot zoom/SAA operators stay f32 under hybrid
    if store.startswith("hybrid"):
        np.testing.assert_array_equal(np.asarray(got["saa"]),
                                      np.asarray(want["saa"]))


def test_fused_ineligible_shapes_fall_back():
    from enph459_super_resolution_tpu.ops.pallas_fused_ibp import (
        fused_eligible,
    )

    assert fused_eligible((1536, 2048), (3072, 4096), "float32")
    assert fused_eligible((768, 1024), (1536, 2048), "float32")
    assert not fused_eligible((100, 256), (200, 512), "float32")
    assert not fused_eligible((128, 200), (256, 400), "float32")
    assert not fused_eligible((128, 256), (256, 512), "float64")


def test_fused_auto_routing():
    """SRTPU_FUSED_IBP=auto routes each band-store mode to its measured
    winner: banded for f32/hybrid, fused for bf16 (TPU only)."""
    from enph459_super_resolution_tpu.sr.classical import _fused_engine_on

    elig = ((1536, 2048), (3072, 4096), "float32")
    on_tpu = jax.devices()[0].platform == "tpu"  # cpu in this suite
    assert not _fused_engine_on("auto", "f32", *elig)
    assert not _fused_engine_on("auto", "hybrid:16", *elig)
    assert _fused_engine_on("auto", "bf16", *elig) == on_tpu
    # explicit force wins regardless of store, gated on eligibility
    assert _fused_engine_on("1", "f32", *elig)
    assert _fused_engine_on("interpret", "hybrid:16", *elig)
    assert not _fused_engine_on("0", "bf16", *elig)
    assert not _fused_engine_on("1", "f32", (100, 256), (200, 512),
                                "float32")
