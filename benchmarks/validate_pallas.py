"""On-hardware validation of every Pallas kernel against its XLA oracle.

Run on a real TPU chip after any change under `ops/pallas/`:

    python benchmarks/validate_pallas.py

Each check runs the kernel NON-interpreted on the device and compares
against the corresponding XLA computation on the same inputs, printing one
line per kernel with the max abs/rel error and a PASS/FAIL verdict against
the recorded tolerance. Interpret-mode coverage lives in tests/; this
script is the hardware truth (Mosaic has miscompiled patterns that
interpret mode executes correctly — see project notes).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAILED = []


def check(name, got, want, atol, rtol, exact=False):
    got, want = np.asarray(got), np.asarray(want)
    if exact:
        ok = np.array_equal(got, want)
        err = float((got != want).mean()) if got.shape == want.shape else 1.0
        print(f"{name:44s} mismatch_frac={err:.2e}  "
              f"{'PASS' if ok else 'FAIL'} (exact)", flush=True)
    else:
        err = np.abs(got - want)
        rel_e = err / (np.abs(want) + 1e-6)
        # Elementwise: every element must be within atol OR rtol (the max
        # abs and max rel errors generally occur at different elements —
        # a global-max OR would reject arrays where each element is fine).
        ok = bool(np.all((err <= atol) | (rel_e <= rtol)))
        bad = (err > atol) & (rel_e > rtol)
        n_bad = int(bad.sum())
        abs_err, rel = float(err.max()), float(rel_e.max())
        print(f"{name:44s} abs={abs_err:.2e} rel={rel:.2e} bad={n_bad}  "
              f"{'PASS' if ok else 'FAIL'} (atol={atol:g} rtol={rtol:g})",
              flush=True)
    if not ok:
        FAILED.append(name)


def agree(name, got, want, min_frac):
    got, want = np.asarray(got), np.asarray(want)
    frac = float((got == want).mean())
    ok = frac >= min_frac
    print(f"{name:44s} agree={frac:.4f}  "
          f"{'PASS' if ok else 'FAIL'} (>= {min_frac})", flush=True)
    if not ok:
        FAILED.append(name)


def main(sections=None):
    """`sections`: subset of {filter, kalman, scalar, stitching, csmc} —
    compiles through the remote tunnel take minutes per kernel, so running
    one section per invocation keeps each run within tooling timeouts."""
    import jax
    import jax.numpy as jnp

    # The XLA oracles must run true-f32 matmuls: the TPU default lowers
    # f32 matmul inputs to bf16, which makes the *oracle* ~1e-3-inaccurate
    # while the Pallas lane kernels sit at f32 epsilon (measured round 2:
    # pallas med_rel 2e-7 vs default-XLA med_rel 3e-3 against f64 truth).
    jax.config.update("jax_default_matmul_precision", "highest")

    all_sections = ("filter", "kalman", "scalar", "stitching", "csmc")
    sections = tuple(sections) if sections else all_sections

    platform = jax.devices()[0].platform
    print(f"device platform: {platform}")
    if platform not in ("tpu", "axon"):
        print("NOT a TPU — this script validates hardware lowering; aborting.")
        sys.exit(2)

    rng = np.random.default_rng(0)
    f32 = jnp.float32
    import importlib
    F = importlib.import_module("aux_ssm_tpu.ops.filtering")

    # ---- filter_scan: fused associative filter scan ----------------------
    if "filter" in sections:
        from aux_ssm_tpu.ops.pallas.filter_scan import fused_filter_scan
        T, d = 300, 4
        A = jnp.asarray(rng.uniform(0.4, 0.9, (T, d, d)) / d, f32)
        b = jnp.asarray(rng.standard_normal((T, d)), f32)
        Cm = rng.standard_normal((T, d, d)) * 0.3
        C = jnp.asarray(Cm @ Cm.transpose(0, 2, 1) + 0.3 * np.eye(d), f32)
        e = jnp.asarray(rng.standard_normal((T, d)), f32)
        Jm = rng.standard_normal((T, d, d)) * 0.2
        J = jnp.asarray(Jm @ Jm.transpose(0, 2, 1) + 0.1 * np.eye(d), f32)
        elems = (A, b, C, e, J)
        got = fused_filter_scan(elems)
        want = jax.lax.associative_scan(F.filtering_operator, elems)
        # Round-3 tightening (50x): an f64-oracle study (RESULTS_r3.md) puts
        # both the fused kernel and the XLA f32 scan at <= 3e-6 norm-relative
        # from truth at T=1024 d=16, so their mutual diff sits at f32
        # roundoff; the old 5e-3 band was masking nothing but near-zero
        # elementwise ratios.
        for g, w, n in zip(got, want, ["A", "b", "C", "eta", "J"]):
            check(f"filter_scan.{n}", g, w, atol=1e-4, rtol=1e-4)

    # ---- kalman_fused: elements / ell / affine / backward maps / logdens -
    if "kalman" in sections:
        from aux_ssm_tpu.ops.pallas import kalman_fused as KF
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        T, dx, dy = 200, 4, 3
        Fs = jnp.asarray(rng.uniform(0.3, 0.8, (T, dx, dx)) / dx, f32)
        Qm = rng.standard_normal((T, dx, dx)) * 0.2
        Qs = jnp.asarray(Qm @ Qm.transpose(0, 2, 1) + 0.4 * np.eye(dx), f32)
        bs = jnp.asarray(0.1 * rng.standard_normal((T, dx)), f32)
        Hs = jnp.asarray(rng.standard_normal((T, dy, dx)), f32)
        Rm = rng.standard_normal((T, dy, dy)) * 0.2
        Rs = jnp.asarray(Rm @ Rm.transpose(0, 2, 1) + 0.5 * np.eye(dy), f32)
        cs = jnp.asarray(0.1 * rng.standard_normal((T, dy)), f32)
        ys = jnp.asarray(rng.standard_normal((T, dy)), f32)
        m_el = jnp.asarray(rng.standard_normal((T, dx)), f32) * \
            jnp.asarray(np.arange(T) == 0, f32)[:, None]
        P_el = jnp.broadcast_to(jnp.eye(dx, dtype=f32), (T, dx, dx)) * \
            jnp.asarray(np.arange(T) == 0, f32)[:, None, None]

        got = KF.fused_make_elements(Fs, Qs, bs, Hs, Rs, cs, ys, m_el, P_el)
        want = F._make_associative_elements(Fs, Qs, bs, Hs, Rs, cs, ys,
                                            m_el[0], P_el[0])
        for g, w, n in zip(got, want, ["A", "b", "C", "eta", "J"]):
            check(f"kalman_fused.elements.{n}", g, w, atol=2e-3, rtol=2e-3)

        ms = jnp.asarray(rng.standard_normal((T, dx)), f32)
        Pm = rng.standard_normal((T, dx, dx)) * 0.3
        Ps = jnp.asarray(Pm @ Pm.transpose(0, 2, 1) + 0.5 * np.eye(dx), f32)
        got = KF.fused_ell(Fs, Qs, bs, Hs, Rs, cs, ys, ms, Ps)
        *_, want = F.kalman_predict_update(ms, Ps, Fs, bs, Qs, ys, Hs, cs, Rs)
        check("kalman_fused.ell", got, want, atol=5e-3, rtol=5e-3)

        from aux_ssm_tpu.ops.sampling import sampling_operator, backward_map_moments
        gains = jnp.asarray(0.4 * rng.standard_normal((T, dx, dx)), f32)
        incs = jnp.asarray(rng.standard_normal((T, dx)), f32)
        gotG, gotE = KF.fused_affine_scan(gains, incs, reverse=True)
        wantG, wantE = jax.lax.associative_scan(sampling_operator, (gains, incs),
                                                reverse=True)
        check("kalman_fused.affine_scan.G", gotG, wantG, atol=5e-3, rtol=5e-3)
        check("kalman_fused.affine_scan.e", gotE, wantE, atol=5e-3, rtol=5e-3)

        eps = jnp.asarray(rng.standard_normal((T, dx)), f32)
        gotg, goti = KF.fused_backward_maps(Fs, Qs, bs, ms, Ps, eps)
        inc_m, L, wg = backward_map_moments(Fs, Qs, bs, ms, Ps)
        wanti = inc_m + jnp.einsum("tij,tj->ti", L, eps)
        check("kalman_fused.backward_maps.gain", gotg, wg, atol=5e-3, rtol=5e-3)
        check("kalman_fused.backward_maps.inc", goti, wanti, atol=5e-3, rtol=5e-3)

        from aux_ssm_tpu.ops.lgssm import LGSSM, posterior_logpdf  # noqa: F401
        xp = jnp.asarray(rng.standard_normal((T, dx)), f32)
        xc = jnp.asarray(rng.standard_normal((T, dx)), f32)
        got = KF.fused_logdensity_steps(Fs, Qs, bs, Hs, Rs, cs, ys, xp, xc)
        from aux_ssm_tpu.ops.lgssm import _masked_step_logpdf
        from aux_ssm_tpu.ops.batched import mv
        from aux_ssm_tpu.ops.mvn import logpdf as mvn_logpdf
        trans = mvn_logpdf(xc, mv(Fs, xp) + bs,
                           jnp.linalg.cholesky(Qs.astype(jnp.float64)).astype(f32))
        obs = _masked_step_logpdf(ys, mv(Hs, xc) + cs, Rs)
        check("kalman_fused.logdensity", got, trans + obs, atol=2e-2, rtol=2e-3)

    # ---- scalar_scan: batched scalar filters -----------------------------
    if "scalar" in sections:
        from aux_ssm_tpu.ops.pallas.scalar_scan import (
            fused_scalar_filter_scan, fused_scalar_affine_scan)
        from aux_ssm_tpu.ops.sampling import sampling_operator as samp_op
        T, B = 1000, 70
        A2 = jnp.asarray(rng.uniform(0.5, 1.0, (T, B)), f32)
        b2 = jnp.asarray(rng.standard_normal((T, B)), f32)
        C2 = jnp.asarray(rng.uniform(0.1, 1.0, (T, B)), f32)
        e2 = jnp.asarray(rng.standard_normal((T, B)), f32)
        J2 = jnp.asarray(rng.uniform(0.0, 0.5, (T, B)), f32)
        got = fused_scalar_filter_scan((A2, b2, C2, e2, J2))
        want = jax.lax.associative_scan(
            F.filtering_operator,
            tuple(z[..., None, None] if i % 2 == 0 else z[..., None]
                  for i, z in enumerate((A2, b2, C2, e2, J2))))
        for g, w, n in zip(got, want, ["A", "b", "C", "eta", "J"]):
            check(f"scalar_scan.filter.{n}", g, w.reshape(w.shape[:2]),
                  atol=5e-3, rtol=5e-3)
        g2 = jnp.asarray(rng.uniform(-0.9, 0.9, (T, B)), f32)
        gotg, gote = fused_scalar_affine_scan(g2, e2, reverse=True)
        wg, we = jax.lax.associative_scan(
            samp_op, (g2[..., None, None], e2[..., None]), reverse=True)
        check("scalar_scan.affine.g", gotg, wg[..., 0, 0], atol=5e-3, rtol=5e-3)
        check("scalar_scan.affine.e", gote, we[..., 0], atol=5e-3, rtol=5e-3)

    # ---- stitching: row_lse + col_sample ---------------------------------
    if "stitching" in sections:
        from aux_ssm_tpu.ops.pallas import stitching as S
        P_, N, kk = 6, 256, 3
        rf = jnp.asarray(rng.standard_normal((P_, N, kk)) * 0.5, f32)
        cf = jnp.asarray(rng.standard_normal((P_, N, kk)) * 0.5, f32)
        cb = jnp.asarray(rng.standard_normal((P_, N)), f32)
        check("stitching.row_lse", S.row_lse(rf, cf, cb), S.row_lse_xla(rf, cf, cb),
              atol=1e-4, rtol=1e-4)
        seed = jnp.int32(1234)
        agree("stitching.col_sample", S.col_sample(seed, rf, cf, cb),
              S.col_sample_xla(seed, rf, cf, cb), min_frac=1.0)
        agree("stitching.col_sample.offset",
              S.col_sample(seed, rf[2:], cf[2:], cb[2:], pair_offset=2),
              S.col_sample_xla(seed, rf, cf, cb)[2:], min_frac=1.0)
        # Single-pass block-mass kernel + the blocked column draw fed by it.
        check("stitching.block_masses", S.block_masses(rf, cf, cb),
              S.block_masses_xla(rf, cf, cb), atol=1e-4, rtol=1e-4)
        rows = jnp.asarray(rng.integers(0, N, (P_, N)), jnp.int32)
        rf_sel = jnp.take_along_axis(rf, rows[:, :, None], axis=1)
        agree("stitching.blocked_col_sample",
              S.blocked_col_sample(seed, rows, S.block_masses(rf, cf, cb),
                                   rf_sel, cf, cb),
              S.blocked_col_sample(seed, rows, S.block_masses_xla(rf, cf, cb),
                                   rf_sel, cf, cb),
              min_frac=0.999)
        # Fully-fused stage-1 + stage-2 draws vs the XLA twin. Shared f32
        # CDF association, so near-exact agreement is expected (ties at
        # CDF boundaries are the only tolerated divergence).
        Lb_ = S.block_masses_xla(rf, cf, cb)
        rb_ = jnp.asarray(rng.standard_normal((P_, N)), f32)
        rl_ = rb_ + jax.scipy.special.logsumexp(Lb_, axis=-1)
        u_ = jax.random.uniform(jax.random.key(7), (P_, N))
        got_rc = S.stitch_draws(seed, rl_, u_, Lb_, rf, cf, cb,
                                pair_offset=1)
        want_rc = S.stitch_draws_xla(seed, rl_, u_, Lb_, rf, cf, cb,
                                     pair_offset=1)
        agree("stitching.stitch_draws.rows", got_rc[0], want_rc[0],
              min_frac=0.999)
        agree("stitching.stitch_draws.cols", got_rc[1], want_rc[1],
              min_frac=0.999)

    # ---- csmc_fwd: index/weight + lane forward, backward -----------------
    if "csmc" in sections:
        from aux_ssm_tpu.ops.pallas import csmc_fwd as CF
        T, N, kk = 200, 64, 2
        rf = jnp.asarray(rng.standard_normal((T - 1, N, kk)) * 0.5, f32)
        cf = jnp.asarray(rng.standard_normal((T - 1, N, kk)) * 0.5, f32)
        rb = jnp.asarray(rng.standard_normal((T - 1, N)), f32)
        cbv = jnp.asarray(rng.standard_normal((T - 1, N)), f32)
        res_u = jnp.asarray(rng.uniform(size=(T - 1, N)), f32)
        anc_u = jnp.asarray(rng.uniform(size=(T - 1,)), f32)
        w0 = jnp.full((N,), 1.0 / N, f32)
        for pgas in (False, True):
            lw_p, anc_p = CF.fused_forward_scan(rf, cf, rb, cbv, res_u, anc_u, w0,
                                                pgas=pgas)
            lw_x, anc_x = CF.factor_scan_xla(rf, cf, rb, cbv, res_u, anc_u, w0,
                                             pgas=pgas)
            tag = "pgas" if pgas else "plain"
            agree(f"csmc_fwd.forward.{tag}.anc", anc_p, anc_x, min_frac=0.99)
            m = np.asarray(anc_p) == np.asarray(anc_x)
            rows = m.all(axis=1)
            check(f"csmc_fwd.forward.{tag}.logw", np.asarray(lw_p)[rows],
                  np.asarray(lw_x)[rows], atol=1e-3, rtol=1e-3)

        lws = jnp.asarray(rng.standard_normal((T - 1, N)), f32)
        us = jnp.asarray(rng.uniform(size=(T - 1,)), f32)
        p_p = CF.fused_backward_scan(rf, cf, rb, lws, us, jnp.int32(3))
        p_x = CF.backward_factor_scan_xla(rf, cf, rb, lws, us, jnp.int32(3))
        agree("csmc_fwd.backward.picked", p_p, p_x, min_frac=0.98)

        from aux_ssm_tpu.models import theta_logistic as tl
        _, ysl = tl.get_data(jax.random.key(0), T)
        M0, G0, Mt, Gt = tl.get_feynman_kac(ysl)
        eps1 = jnp.asarray(rng.standard_normal((T - 1, N)), f32)
        x_star = jnp.asarray(rng.standard_normal(T - 1), f32)
        x0 = jnp.asarray(rng.standard_normal(N), f32)
        for pgas in (False, True):
            pg = Mt.lane_logpdf if pgas else None
            ptp = Mt.params if pgas else None
            args = (Mt.lane_propagate, Gt.lane_logw, pg, Mt.params, Gt.params, ptp,
                    eps1, res_u, anc_u, x_star, x0, w0)
            xs_p, lw_p, anc_p = CF.lane_forward_scan(*args)
            xs_x, lw_x, anc_x = CF.lane_scan_xla(*args)
            tag = "pgas" if pgas else "plain"
            agree(f"csmc_fwd.lane.{tag}.anc", anc_p, anc_x, min_frac=0.99)
            m = (np.asarray(anc_p) == np.asarray(anc_x)).all(axis=1)
            check(f"csmc_fwd.lane.{tag}.xs", np.asarray(xs_p)[m],
                  np.asarray(xs_x)[m], atol=1e-4, rtol=1e-4)

        # Block-lane sweep (d > 1 state-dependent proposals: SV guided in
        # Q's eigenbasis).
        from aux_ssm_tpu.models import stochastic_volatility as sv
        Tb, Db, Nb = 24, 30, 32
        _, ysb = sv.get_data(jax.random.key(3), 0.0, 0.9, 2.0, 0.25, Db, Tb)
        factory_b, _ = sv.make_guided_factory(ysb, 0.0, 0.9, 2.0, 0.25)
        ub = jnp.asarray(rng.standard_normal((Tb, Db)), f32)
        scb = jnp.asarray(rng.uniform(0.3, 0.6, size=Tb), f32)
        _M0b, _G0b, Mtb, Gtb = factory_b(ub, scb)
        epsb = jnp.asarray(rng.standard_normal((Tb - 1, Db, Nb)), f32)
        res_ub = jnp.asarray(rng.uniform(size=(Tb - 1, Nb)), f32)
        x_starb = jnp.asarray(rng.standard_normal((Tb - 1, Db)), f32)
        x0b = jnp.asarray(rng.standard_normal((Db, Nb)), f32)
        w0b = jnp.full((Nb,), 1.0 / Nb, f32)
        argsb = (Mtb.block_propagate, Gtb.block_logw, Mtb.params, Gtb.params,
                 Mtb.block_consts, Gtb.block_consts, epsb, res_ub, x_starb,
                 x0b, w0b)
        xs_p, lw_p, anc_p = CF.block_lane_forward_scan(*argsb)
        xs_x, lw_x, anc_x = CF.block_lane_scan_xla(*argsb)
        agree("csmc_fwd.block_lane.anc", anc_p, anc_x, min_frac=0.99)
        mb_ = (np.asarray(anc_p) == np.asarray(anc_x)).all(axis=1)
        check("csmc_fwd.block_lane.xs", np.asarray(xs_p)[mb_],
              np.asarray(xs_x)[mb_], atol=1e-4, rtol=1e-4)
        check("csmc_fwd.block_lane.logw", np.asarray(lw_p)[mb_],
              np.asarray(lw_x)[mb_], atol=1e-3, rtol=1e-3)

        # Chunked large-N lane path (shift-add cumsum + 128-row rank
        # count/gather; engages past csmc.csmc._FUSED_MAX_N). The comparison
        # is RE-SYNCED per step: iterated resampling is chaotic, so a single
        # tie-level f32 flip early in a free-running chain cascades into
        # wholesale ancestor disagreement that says nothing about kernel
        # correctness. Each step gets the XLA reference's carry
        # (x_{t-1}, softmax(log_w_{t-1})), making per-step agreement exact.
        Tc, Nc = 12, 2048
        res_uc = jnp.asarray(rng.uniform(size=(Tc - 1, Nc)), f32)
        anc_uc = jnp.asarray(rng.uniform(size=(Tc - 1,)), f32)
        epsc = jnp.asarray(rng.standard_normal((Tc - 1, Nc)), f32)
        x_starc = jnp.asarray(rng.standard_normal(Tc - 1), f32)
        x0c = jnp.asarray(rng.standard_normal(Nc), f32)
        w0c = jnp.full((Nc,), 1.0 / Nc, f32)
        _, ysc = tl.get_data(jax.random.key(2), Tc)
        M0c, G0c, Mtc, Gtc = tl.get_feynman_kac(ysc)
        for pgas in (False, True):
            pg = Mtc.lane_logpdf if pgas else None
            ptp = Mtc.params if pgas else None
            args = (Mtc.lane_propagate, Gtc.lane_logw, pg, Mtc.params,
                    Gtc.params, ptp, epsc, res_uc, anc_uc, x_starc, x0c, w0c)
            xs_x, lw_x, anc_x = CF.lane_scan_xla(*args)
            anc_rows, xs_rows = [], []
            x_c, w_c = x0c, w0c
            for t in range(Tc - 1):
                sl = lambda z, t=t: jax.tree.map(lambda a: a[t:t + 1], z)
                xs_p1, lw_p1, anc_p1 = CF.lane_forward_scan(
                    Mtc.lane_propagate, Gtc.lane_logw, pg, sl(Mtc.params),
                    sl(Gtc.params), sl(ptp) if pgas else ptp, epsc[t:t + 1],
                    res_uc[t:t + 1], anc_uc[t:t + 1], x_starc[t:t + 1],
                    x_c, w_c)
                anc_rows.append(np.asarray(anc_p1[0]))
                xs_rows.append(np.asarray(xs_p1[0]))
                x_c = xs_x[t]
                wn = jnp.exp(lw_x[t] - jnp.max(lw_x[t]))
                w_c = wn / jnp.sum(wn)
            tag = "pgas" if pgas else "plain"
            anc_p = np.stack(anc_rows)
            agree(f"csmc_fwd.lane_chunked.{tag}.anc", anc_p, anc_x,
                  min_frac=0.999)
            m = (anc_p == np.asarray(anc_x)).all(axis=1)
            check(f"csmc_fwd.lane_chunked.{tag}.xs", np.stack(xs_rows)[m],
                  np.asarray(xs_x)[m], atol=1e-4, rtol=1e-4)

    print()
    if FAILED:
        print(f"FAILED ({len(FAILED)}): {FAILED}")
        sys.exit(1)
    print("ALL PALLAS KERNELS VALIDATED ON HARDWARE")


if __name__ == "__main__":
    main(sys.argv[1:])
