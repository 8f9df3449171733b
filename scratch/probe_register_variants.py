"""Which XLA formulation of the polyphase registration is fast on this
backend?  The round-4 serving breakdown (probe_fusion_lr_speed) measured
register_burst_phases at 0.165 s for 4x1536x2048 — 64% of the whole
bf16 fuse — yet its roofline is ~5 ms of HBM traffic.  Suspects: the two
full-array transposes that move the tiny phase/frame dims to the minor
axis ((fx,fy,h,w)->(h,w,fy,fx) inside keys_register_phases, then
(N,h,w,f2)->(h,w,N,f2) in register_burst_phases).

Variants (all produce the identical (h, w, N*f^2) tensor, verified):
  a. current         keys_register_phases + moveaxis (the shipped path)
  b. no_final_T      same phase-pass einsums, output left (N,f2,h,w) —
                     isolates the transpose cost (NOT contract-equal)
  c. chanlast        python-unrolled separable taps written directly into
                     a last-axis stack — zero transposes, XLA multi-output
                     fusion does the interleave
  d. conv            two lax.conv_general_dilated passes (phases = output
                     channels, frames = batch), one (N,h,w,f2)->(h,w,N*f2)
                     relayout at the end

Run on the real chip:  python scratch/probe_register_variants.py
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--h", type=int, default=1536)
    p.add_argument("--w", type=int, default=2048)
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--timings", type=int, default=3)
    p.add_argument("--passes", type=int, default=2)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp

    from enph459_super_resolution_tpu.ops.resize import (
        _keys_cubic_jnp, _keys_phase_pass)
    from enph459_super_resolution_tpu.sr.fusion import (
        NOMINAL_SHIFTS_4, register_burst_phases)

    dev = jax.devices()[0]
    h, w, f = args.h, args.w, 2
    hr_mpix = (h * f) * (w * f) / 1e6
    rng = np.random.default_rng(0)
    lr = jax.device_put(rng.uniform(0, 255, (4, h, w)).astype(np.float32),
                        dev)
    nom = jnp.asarray(NOMINAL_SHIFTS_4, jnp.float32)

    def reg_current(l):
        return register_burst_phases(l, nom, f)

    def reg_no_final_T(l):
        # phase passes only, no channel-last relayout (different contract)
        def one(fr, s):
            us_y = [(q + 0.5) / f - 0.5 - s[0] for q in range(f)]
            us_x = [(q + 0.5) / f - 0.5 - s[1] for q in range(f)]
            rows = _keys_phase_pass(fr, us_y, fr.ndim - 2, 6)
            return _keys_phase_pass(rows, us_x, rows.ndim - 1, 6)
        return jax.vmap(one)(l, nom)  # (N, fx, fy, h, w)

    def _phase_weights(d, pad):
        # per-axis: [(base_i32, [w5 x phases])] shared 5-tap window
        us = [(q + 0.5) / f - 0.5 - d for q in range(f)]
        b0 = jnp.floor(us[0])
        base = b0.astype(jnp.int32) + (pad - 1)
        ws = [jnp.stack([_keys_cubic_jnp(u - b0 - (j - 1))
                         for j in range(5)]) for u in us]  # each (5,)
        return base, ws

    def reg_chanlast(l, pad=6):
        outs = []
        for n in range(l.shape[0]):
            fr = jnp.pad(l[n], pad, mode="edge")
            by, wys = _phase_weights(nom[n, 0], pad)
            bx, wxs = _phase_weights(nom[n, 1], pad)
            taps = [jax.lax.dynamic_slice(
                fr, (by + j, bx), (h, w + 2 * pad)) for j in range(5)]
            for wy in wys:
                row = sum(wy[j] * taps[j] for j in range(5))  # (h, w+2p)
                cols = [jax.lax.dynamic_slice(
                    row, (0, bx), (h, w))]
                # taps along x on the row result (bx already offsets pad)
                cols = [jax.lax.dynamic_slice(row, (0, bx + k), (h, w))
                        for k in range(5)]
                for wx in wxs:
                    outs.append(sum(wx[k] * cols[k] for k in range(5)))
        return jnp.stack(outs, axis=-1)  # (h, w, N*f*f)

    def reg_conv(l, pad=6):
        # frames = batch, phases = output channels; edge pre-pad + VALID
        by, wys = _phase_weights(nom[0, 0], pad)
        # NOTE conv weights must be shared across frames -> only valid
        # when all frames share the shift magnitude pattern; for the probe
        # we build per-frame convs and concat (4 tiny convs).
        outs = []
        for n in range(l.shape[0]):
            fr = jnp.pad(l[n], pad, mode="edge")[None, :, :, None]
            by, wys = _phase_weights(nom[n, 0], pad)
            bx, wxs = _phase_weights(nom[n, 1], pad)
            fr = jax.lax.dynamic_slice(
                fr, (0, by, bx, 0), (1, h + 4, w + 4, 1))
            ky = jnp.stack(wys, 1)[:, None, None, :]  # (5,1,1,fy)
            ry = jax.lax.conv_general_dilated(
                fr, ky, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (1,h,w+4,fy)
            kx = jnp.zeros((1, 5, f, f * f), ry.dtype)
            for py in range(f):
                for px in range(f):
                    kx = kx.at[0, :, py, py * f + px].set(wxs[px])
            rx = jax.lax.conv_general_dilated(
                ry, kx, (1, 1), "VALID", feature_group_count=1,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (1,h,w,f2)?
            outs.append(rx[0])
        return jnp.concatenate(outs, axis=-1)

    def _keys_cubic_np(t):
        t = np.abs(np.asarray(t, np.float64))
        a = -0.5
        return np.where(
            t <= 1, (a + 2) * t ** 3 - (a + 3) * t ** 2 + 1,
            np.where(t < 2, a * (t ** 3 - 5 * t ** 2 + 8 * t - 4), 0.0))

    nom_np = np.asarray(NOMINAL_SHIFTS_4, np.float64)

    def reg_static(l, pad=6):
        # serving shifts are STATIC -> base indices are python ints
        # (lax.slice) and the tap weights are constants: the hypothesis
        # that traced-start dynamic slices are the 25x-off-roofline cost
        outs = []
        for n in range(l.shape[0]):
            fr = jnp.pad(l[n], pad, mode="edge")
            res = {}
            for axis, d in ((0, nom_np[n, 0]), (1, nom_np[n, 1])):
                us = [(q + 0.5) / f - 0.5 - d for q in range(f)]
                b0 = int(np.floor(us[0]))
                res[axis] = (b0 + pad - 1,
                             [np.float32(_keys_cubic_np(u - b0 - (j - 1)))
                              for u in us for j in [0]] and
                             [[np.float32(_keys_cubic_np(u - b0 - (j - 1)))
                               for j in range(5)] for u in us])
            by, wys = res[0]
            bx, wxs = res[1]
            taps = [jax.lax.slice(fr, (by + j, 0),
                                  (by + j + h, 2 * pad + w))
                    for j in range(5)]
            for wy in wys:
                row = sum(float(wy[j]) * taps[j] for j in range(5))
                cols = [jax.lax.slice(row, (0, bx + k), (h, bx + k + w))
                        for k in range(5)]
                for wx in wxs:
                    outs.append(sum(float(wx[k]) * cols[k]
                                    for k in range(5)))
        return jnp.stack(outs, axis=-1)

    # correctness vs current (chanlast must be exact)
    ref = np.asarray(jax.jit(reg_current)(lr))
    got = np.asarray(jax.jit(reg_chanlast)(lr))
    err_c = float(np.max(np.abs(ref - got)))
    got_e = np.asarray(jax.jit(reg_static)(lr))
    err_e = float(np.max(np.abs(ref - got_e)))
    arms = {"a_current": reg_current, "b_no_final_T": reg_no_final_T,
            "c_chanlast": reg_chanlast, "e_static": reg_static}
    try:
        got_d = np.asarray(jax.jit(reg_conv)(lr))
        err_d = float(np.max(np.abs(ref - got_d)))
        if err_d < 1e-2:
            arms["d_conv"] = reg_conv
    except Exception as e:  # pragma: no cover - probe resilience
        err_d = f"failed: {e}"

    def rolled(fn, n):
        @jax.jit
        def loop(x):
            def body(i, v):
                return v + 1e-12 * jnp.mean(fn(v))
            return jax.lax.fori_loop(0, n, body, x)
        return loop

    loops = {k: rolled(fn, args.reps) for k, fn in arms.items()}
    for fn in loops.values():
        float(np.asarray(fn(lr)).ravel()[0])  # compile
    results = {k: [] for k in loops}
    for _ in range(args.passes):
        for name, fn in loops.items():
            for _ in range(args.timings):
                t0 = time.perf_counter()
                float(np.asarray(fn(lr)).ravel()[0])
                results[name].append((time.perf_counter() - t0) / args.reps)

    out = {"err_chanlast_vs_current": err_c,
           "err_conv_vs_current": err_d,
           "err_static_vs_current": err_e}
    for name, ts in results.items():
        med = float(np.median(ts))
        out[name] = {"median_s": round(med, 4),
                     "spread": [round(min(ts), 4), round(max(ts), 4)],
                     "hr_mpix_per_s": round(hr_mpix / med, 2)}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
