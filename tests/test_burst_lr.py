"""LR-grid burst fusion (round 4): polyphase Keys registration, the
BurstFusionLR trunk, and the banded Landweber refine engine.

The round-3 HR-grid engine measured bandwidth-bound at ~17 HR Mpix/s with
a 0.47 s/iter vjp refine; this stack moves all trunk compute and the
registration to the LR grid and the refine onto the banded-MXU adjoint
operators.  These tests pin the numerics that redesign must preserve.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enph459_super_resolution_tpu.models import create_model
from enph459_super_resolution_tpu.ops.resize import (
    _keys_cubic, keys_register_phases, phases_to_hr)
from enph459_super_resolution_tpu.sr.classical import (
    landweber_refine, make_gaussian_psf, shift_and_add, solve)
from enph459_super_resolution_tpu.sr.fusion import (
    NOMINAL_SHIFTS_4, FusionEngine, fuse, register_burst_phases)

SHIFTS = NOMINAL_SHIFTS_4


def _keys_interp_oracle(lr, sy, sx, factor):
    """Brute-force numpy Keys-cubic resample at the registration's
    coordinate map c(i) = (i + 0.5)/factor - 0.5 - shift, edge clamp,
    separable (rows then cols)."""
    H, W = lr.shape[0] * factor, lr.shape[1] * factor
    out = np.zeros((H, W))
    for i in range(H):
        cy = (i + 0.5) / factor - 0.5 - sy
        my = int(np.floor(cy))
        row = np.zeros(lr.shape[1])
        for j in range(4):
            idx = np.clip(my + j - 1, 0, lr.shape[0] - 1)
            row += lr[idx] * _keys_cubic(np.array(cy - my - (j - 1)))
        for jj in range(W):
            cx = (jj + 0.5) / factor - 0.5 - sx
            mx = int(np.floor(cx))
            acc = 0.0
            for j in range(4):
                idx = np.clip(mx + j - 1, 0, lr.shape[1] - 1)
                acc += row[idx] * _keys_cubic(np.array(cx - mx - (j - 1)))
            out[i, jj] = acc
    return out


class TestKeysRegisterPhases:
    @pytest.mark.parametrize("shift", [(0.0, 0.0), (0.5, -0.5),
                                       (0.37, 0.81), (-1.2, 0.9)])
    def test_matches_bruteforce_oracle(self, shift):
        rng = np.random.default_rng(0)
        lr = rng.uniform(0, 255, (9, 11)).astype(np.float32)
        ph = keys_register_phases(jnp.asarray(lr),
                                  jnp.asarray(shift, jnp.float32), 2)
        hr = np.asarray(phases_to_hr(ph, 2))
        want = _keys_interp_oracle(lr, *shift, 2)
        np.testing.assert_allclose(hr, want, atol=3e-3)

    def test_zero_shift_interior_is_imresize_upsample(self):
        """c(i) = (i+0.5)/f - 0.5 at zero shift IS the imresize upsample
        coordinate map; interiors must match ops.resize.resize (the
        boundaries differ: edge clamp vs symmetric fold)."""
        from enph459_super_resolution_tpu.ops.resize import resize
        rng = np.random.default_rng(1)
        lr = rng.uniform(0, 255, (12, 10)).astype(np.float32)
        hr = np.asarray(phases_to_hr(
            keys_register_phases(jnp.asarray(lr), jnp.zeros(2), 2), 2))
        up = np.asarray(resize(jnp.asarray(lr), (24, 20)))
        np.testing.assert_allclose(hr[4:-4, 4:-4], up[4:-4, 4:-4],
                                   atol=1e-3)

    def test_traced_shift_single_compile(self):
        calls = 0

        @jax.jit
        def f(lr, s):
            nonlocal calls
            calls += 1
            return keys_register_phases(lr, s, 2)

        lr = jnp.zeros((8, 8), jnp.float32)
        f(lr, jnp.asarray([0.3, -0.2]))
        f(lr, jnp.asarray([-0.8, 0.6]))
        assert calls == 1  # shifts are data, not trace constants


class TestBurstFusionLRModel:
    def _model_params(self, **kw):
        m = create_model("burstfusion_lr", n_frames=4, factor=2,
                         n_feats=8, n_resblocks=2, **kw)
        p = m.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 16, 16, 16), jnp.float32))
        return m, p

    def test_zero_init_is_keys_saa(self):
        """With the zero-init head the untrained model IS shift-and-add
        under the Keys registration (the HR variant's property, kept)."""
        rng = np.random.default_rng(2)
        lr = jnp.asarray(rng.uniform(0, 255, (4, 24, 32)), jnp.float32)
        nom = jnp.asarray(SHIFTS, jnp.float32)
        m, p = self._model_params()
        sr = fuse(m.apply, p, lr, nom, 2, register=register_burst_phases)
        ph = register_burst_phases(lr, nom, 2)
        per = ph.reshape(ph.shape[:2] + (4, 4))
        saa = phases_to_hr(jnp.mean(per, axis=-2), 2)
        np.testing.assert_allclose(np.asarray(sr),
                                   np.clip(np.asarray(saa), 0, 255),
                                   atol=1e-4)

    def test_bf16_trunk_stays_in_f32_parity_class(self):
        """bf16 compute perturbs only the (residual-scaled) trunk output;
        on a trained-ish net the deviation stays a small fraction of the
        signal range."""
        rng = np.random.default_rng(3)
        lr = jnp.asarray(rng.uniform(0, 255, (4, 24, 32)), jnp.float32)
        nom = jnp.asarray(SHIFTS, jnp.float32)
        m32, p = self._model_params()
        m16, _ = self._model_params(dtype=jnp.bfloat16)
        # non-zero head: perturb params so the residual path contributes
        p = jax.tree.map(lambda a: a + 0.01, p)
        a = fuse(m32.apply, p, lr, nom, 2, register=register_burst_phases)
        b = fuse(m16.apply, p, lr, nom, 2, register=register_burst_phases)
        assert float(jnp.abs(a - b).max()) < 2.0  # counts, on 0..255

    def test_rejects_wrong_channel_count(self):
        m, p = self._model_params()
        with pytest.raises(ValueError, match="phase channels"):
            m.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 16, 16, 4), jnp.float32))


class TestLandweberRefineBanded:
    def test_matches_adjoint_solver_from_saa_seed(self, monkeypatch):
        """Seeded from SAA it must reproduce the SRTPU_SOLVER=adjoint
        trajectory (same transposed banded operators, same update)."""
        rng = np.random.default_rng(4)
        psf = make_gaussian_psf()
        lrs = jnp.asarray(rng.uniform(0, 255, (4, 64, 48)), jnp.float32)
        hr0 = jnp.clip(shift_and_add(lrs, SHIFTS, 2), 0, 255)
        hr, errs, final = landweber_refine(hr0, lrs, psf, SHIFTS, n_iter=8)

        monkeypatch.setenv("SRTPU_SOLVER", "adjoint")
        want = solve(lrs, psf, SHIFTS, n_iter=8, step=2.0)
        np.testing.assert_allclose(np.asarray(errs),
                                   np.asarray(want["mse_history"]),
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(hr), np.asarray(want["ibp"]),
                                   atol=0.5)
        assert float(final) < float(errs[0])  # descends on the objective

    def test_final_mse_is_fit_of_returned_estimate(self):
        rng = np.random.default_rng(5)
        psf = make_gaussian_psf()
        lrs = jnp.asarray(rng.uniform(0, 255, (4, 32, 32)), jnp.float32)
        hr0 = jnp.clip(shift_and_add(lrs, SHIFTS, 2), 0, 255)
        _, errs1, final1 = landweber_refine(hr0, lrs, psf, SHIFTS, n_iter=3)
        _, errs2, _ = landweber_refine(hr0, lrs, psf, SHIFTS, n_iter=4)
        # history[i] is pre-update i, so refine(4)'s last entry is the fit
        # of refine(3)'s returned estimate
        np.testing.assert_allclose(float(final1), float(errs2[-1]),
                                   rtol=1e-5)


class TestLRArchEndToEnd:
    def test_train_eval_engine_roundtrip(self, tmp_path):
        """arch='lr' trains, records its model, reloads through
        FusionEngine (banded refine default), and the banded and vjp
        refine engines agree on the result."""
        from enph459_super_resolution_tpu.train.burst import train_burst

        run = str(tmp_path / "run")
        out = train_burst(steps=3, batch=2, lr_patch=12, pool_images=10,
                          arch="lr", n_feats=8, n_resblocks=2,
                          out_dir=run, eval_every=3, ckpt_every=3, seed=0)
        assert np.isfinite(out["psnr_fusion"])
        cfg = json.loads((tmp_path / "run" / "config.json").read_text())
        assert cfg["model"] == "burstfusion_lr"

        rng = np.random.default_rng(6)
        lr = rng.uniform(0, 255, (4, 24, 32)).astype(np.float32)
        psf = make_gaussian_psf()
        sr_b, mse_b, raw_b = FusionEngine(run, refine=5)(lr, SHIFTS, psf)
        sr_v, mse_v, raw_v = FusionEngine(run, refine=5,
                                          refine_engine="vjp")(lr, SHIFTS,
                                                               psf)
        assert float(mse_b) < float(raw_b)  # refinement improves the fit
        # same update rule, scipy-banded vs Keys-vjp adjoint: equal to
        # interpolant tolerance
        np.testing.assert_allclose(float(mse_b), float(mse_v), rtol=2e-2)
        np.testing.assert_allclose(np.asarray(sr_b), np.asarray(sr_v),
                                   atol=1.0)


class TestBandedRegistration:
    """Static-shift registration as banded MXU operators (round 4): the
    serving path's registration must match the traced elementwise form it
    replaces (same Keys taps, matmul accumulation order)."""

    def test_banded_matches_traced(self):
        rng = np.random.default_rng(3)
        from enph459_super_resolution_tpu.sr.fusion import (
            build_register_phase_ops, register_burst_phases_banded)

        lr = rng.uniform(0, 255, (4, 40, 48)).astype(np.float32)
        shifts = np.asarray(SHIFTS, np.float64) + rng.normal(0, 0.3, (4, 2))
        traced = np.asarray(register_burst_phases(
            jnp.asarray(lr), jnp.asarray(shifts, jnp.float32), 2))
        ops = build_register_phase_ops(shifts, 40, 48, 2)
        banded = np.asarray(jax.jit(register_burst_phases_banded)(lr, ops))
        assert banded.shape == traced.shape == (40, 48, 16)
        np.testing.assert_allclose(banded, traced, atol=2e-3)

    def test_banded_matches_traced_large_shift_boundary(self):
        # |shift| > 1 moves the shared window across the clamped edge on
        # both sides; the banded 'nearest' entries must realize the same
        # edge-clamp the traced path gets from its edge pad
        rng = np.random.default_rng(4)
        from enph459_super_resolution_tpu.sr.fusion import (
            build_register_phase_ops, register_burst_phases_banded)

        lr = rng.uniform(0, 255, (2, 16, 20)).astype(np.float32)
        shifts = np.asarray([[1.7, -2.3], [-1.1, 2.9]])
        traced = np.asarray(register_burst_phases(
            jnp.asarray(lr), jnp.asarray(shifts, jnp.float32), 2,))
        ops = build_register_phase_ops(shifts, 16, 20, 2)
        banded = np.asarray(jax.jit(register_burst_phases_banded)(lr, ops))
        np.testing.assert_allclose(banded, traced, atol=2e-3)

    def test_engine_static_vs_traced_register(self, tmp_path):
        from enph459_super_resolution_tpu.train.burst import train_burst

        run = str(tmp_path / "run")
        train_burst(steps=3, batch=2, lr_patch=12, pool_images=10,
                    arch="lr", n_feats=8, n_resblocks=2,
                    out_dir=run, eval_every=3, ckpt_every=3, seed=0)
        rng = np.random.default_rng(7)
        lr = rng.uniform(0, 255, (4, 24, 32)).astype(np.float32)
        psf = make_gaussian_psf()
        eng_s = FusionEngine(run)
        assert eng_s.static_register
        sr_s, mse_s, _ = eng_s(lr, SHIFTS, psf)
        eng_t = FusionEngine(run, static_register=False)
        assert not eng_t.static_register
        sr_t, mse_t, _ = eng_t(lr, SHIFTS, psf)
        np.testing.assert_allclose(np.asarray(sr_s), np.asarray(sr_t),
                                   atol=0.5)
        np.testing.assert_allclose(float(mse_s), float(mse_t), rtol=1e-3)


class TestConvRegistration:
    """Static-shift registration as ONE conv (round 5): the serving path
    — build_register_phase_conv / RegisterConv — must match both the
    banded and the traced forms, including the 'nearest' edge clamp
    (realized as edge-replicate padding) and batched bursts."""

    def test_conv_matches_banded_and_traced(self):
        rng = np.random.default_rng(5)
        from enph459_super_resolution_tpu.sr.fusion import (
            build_register_phase_conv, build_register_phase_ops,
            register_burst_phases_banded, register_burst_phases_conv)

        lr = rng.uniform(0, 255, (4, 40, 48)).astype(np.float32)
        shifts = np.asarray(SHIFTS, np.float64) + rng.normal(0, 0.3, (4, 2))
        traced = np.asarray(register_burst_phases(
            jnp.asarray(lr), jnp.asarray(shifts, jnp.float32), 2))
        ops = build_register_phase_ops(shifts, 40, 48, 2)
        banded = np.asarray(jax.jit(register_burst_phases_banded)(lr, ops))
        conv = build_register_phase_conv(shifts, 2)
        # through jit as an ARGUMENT (pads are static aux data)
        got = np.asarray(jax.jit(register_burst_phases_conv)(lr, conv))
        assert got.shape == (40, 48, 16)
        np.testing.assert_allclose(got, banded, atol=5e-4)
        np.testing.assert_allclose(got, traced, atol=2e-3)

    def test_conv_matches_banded_large_shift_boundary(self):
        rng = np.random.default_rng(6)
        from enph459_super_resolution_tpu.sr.fusion import (
            build_register_phase_conv, build_register_phase_ops,
            register_burst_phases_banded, register_burst_phases_conv)

        lr = rng.uniform(0, 255, (2, 16, 20)).astype(np.float32)
        shifts = np.asarray([[1.7, -2.3], [-1.1, 2.9]])
        ops = build_register_phase_ops(shifts, 16, 20, 2)
        banded = np.asarray(jax.jit(register_burst_phases_banded)(lr, ops))
        conv = build_register_phase_conv(shifts, 2)
        got = np.asarray(jax.jit(register_burst_phases_conv)(lr, conv))
        np.testing.assert_allclose(got, banded, atol=5e-4)

    def test_conv_batched_bursts(self):
        rng = np.random.default_rng(7)
        from enph459_super_resolution_tpu.sr.fusion import (
            build_register_phase_conv, register_burst_phases_conv)

        bursts = rng.uniform(0, 255, (3, 4, 24, 32)).astype(np.float32)
        conv = build_register_phase_conv(SHIFTS, 2)
        got = np.asarray(register_burst_phases_conv(
            jnp.asarray(bursts), conv))
        assert got.shape == (3, 24, 32, 16)
        for b in range(3):
            one = np.asarray(register_burst_phases_conv(
                jnp.asarray(bursts[b]), conv))
            np.testing.assert_allclose(got[b], one, atol=1e-4)

    def test_engine_uses_conv_register(self, tmp_path):
        from enph459_super_resolution_tpu.sr.fusion import RegisterConv
        from enph459_super_resolution_tpu.train.burst import train_burst

        run = str(tmp_path / "run")
        train_burst(steps=3, batch=2, lr_patch=12, pool_images=10,
                    arch="lr", n_feats=8, n_resblocks=2,
                    out_dir=run, eval_every=3, ckpt_every=3, seed=0)
        eng = FusionEngine(run)
        rng = np.random.default_rng(8)
        lr = rng.uniform(0, 255, (4, 24, 32)).astype(np.float32)
        eng(lr, SHIFTS, make_gaussian_psf())
        (reg,) = eng._reg_ops.values()
        assert isinstance(reg, RegisterConv)
