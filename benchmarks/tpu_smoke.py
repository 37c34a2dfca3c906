"""On-hardware smoke of EVERY sampler family: a few kernel steps each on the
real chip, printing update/acceptance rates. Catches Mosaic-only breakage
that CPU tests (interpret mode) and per-kernel validation can miss — run
after any change under ops/pallas/ or the fused-path dispatchers.

    python benchmarks/tpu_smoke.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _run(name, init, kernel, x0, delta, n=20, chex_rate=(0.0, 1.0)):
    def body(st, k):
        st = kernel(k, st, delta)
        upd = st.updated
        return st, jnp.mean(upd.astype(jnp.float32))

    def chain(key, x):
        st, rates = jax.lax.scan(body, init(x), jax.random.split(key, n))
        return st.x, jnp.mean(rates)

    tic = time.perf_counter()
    x_out, rate = jax.jit(chain)(jax.random.key(0), x0)
    rate = float(rate)                       # host-read fence
    toc = time.perf_counter()
    ok = np.isfinite(np.asarray(x_out)).all() and chex_rate[0] <= rate <= chex_rate[1]
    print(f"{name:42s} rate={rate:.3f}  {toc - tic:6.1f}s "
          f"{'PASS' if ok else 'FAIL'}")
    return ok


def main():
    ok = True
    # --- SV family ---
    from aux_ssm_tpu.models import stochastic_volatility as sv
    T, D, N = 64, 8, 25
    _, ys = sv.get_data(jax.random.key(0), 0.0, 0.9, 2.0, 0.25, D, T)
    ys = ys.astype(jnp.float32)
    x0 = jnp.zeros((T, D), jnp.float32)

    for order in (1, 2):
        i_, k_ = sv.get_kalman_kernel(ys, 0.0, 0.9, 2.0, 0.25, True, order=order)
        ok &= _run(f"sv kalman-{order} (parallel filter)", i_, k_, x0,
                   jnp.float32(1e-2), chex_rate=(0.01, 1.0))
    i_, k_ = sv.get_csmc_kernel(ys, 0.0, 0.9, 2.0, 0.25, N, backward=True)
    ok &= _run("sv csmc independent+backward (factor kernel)", i_, k_, x0,
               jnp.full((T,), 0.1, jnp.float32), chex_rate=(0.05, 1.0))
    i_, k_ = sv.get_csmc_kernel(ys, 0.0, 0.9, 2.0, 0.25, N, gradient=True)
    ok &= _run("sv csmc gradient (factor kernel)", i_, k_, x0,
               jnp.full((T,), 0.1, jnp.float32), chex_rate=(0.05, 1.0))
    i_, k_ = sv.get_guided_csmc_kernel(ys, 0.0, 0.9, 2.0, 0.25, N, backward=True)
    ok &= _run("sv csmc-guided (block-lane kernel)", i_, k_, x0,
               jnp.full((T,), 5e-2, jnp.float32), chex_rate=(0.3, 1.0))
    i_, k_ = sv.get_csmc_kernel(ys, 0.0, 0.9, 2.0, 0.25, N, parallel=True)
    ok &= _run("sv csmc parallel-in-time (PIT stitching)", i_, k_, x0,
               jnp.full((T,), 0.1, jnp.float32), chex_rate=(0.05, 1.0))

    # --- spatial family (batched scalar filters / grid potential) ---
    from aux_ssm_tpu.models import spatial as sp
    Dg, Tg = 4, 64
    rng = np.random.default_rng(0)
    _, ysg = sp.get_data(rng, 0.3, 1.0, -0.25, 4.0, Dg, Tg)
    ysg = jnp.asarray(ysg, jnp.float32)
    xg = jnp.zeros((Tg, Dg * Dg, 1), jnp.float32)
    i_, k_ = sp.get_kalman_kernel(ysg, 0.3, 4.0, -0.25, 1.0, Dg, True, order=1)
    ok &= _run("spatial kalman-1 (scalar block-scan)", i_, k_, xg,
               jnp.float32(1e-2), chex_rate=(0.01, 1.0))
    i_, k_ = sp.get_guided_csmc_kernel(ysg, 0.3, 4.0, -0.25, 1.0, Dg, N,
                                       backward=True)
    ok &= _run("spatial csmc-guided (block-lane kernel)", i_, k_,
               xg[..., 0], jnp.full((Tg,), 5e-2, jnp.float32),
               chex_rate=(0.0, 1.0))

    # --- theta-logistic (scalar lane kernel, PGAS) ---
    from aux_ssm_tpu.models import theta_logistic as tl
    Tt = 64
    _, yst = tl.get_data(jax.random.key(1), Tt)
    M0, G0, Mt, Gt = tl.get_feynman_kac(jnp.asarray(yst, jnp.float32))
    from aux_ssm_tpu.kernels.csmc import get_kernel as get_csmc
    i_, kk = get_csmc(M0, G0, Mt, Gt, 64, backward=True,
                      ancestor_sampling=True)
    k_ = lambda key, st, _d: kk(key, st)
    ok &= _run("theta-logistic PGAS (lane kernel)", i_, k_,
               jnp.full((Tt, 1), 0.7, jnp.float32), None,
               chex_rate=(0.05, 1.0))

    # --- lorenz Gibbs (extended linearisation + conjugate theta) ---
    from aux_ssm_tpu.models import lorenz
    Tl = 128
    m0 = jnp.array([1.5, -1.5, 25.0], jnp.float32)
    P0 = jnp.eye(3, dtype=jnp.float32)
    xs_l = lorenz.sample_trajectory(jax.random.key(2), m0, P0,
                                    jnp.array([10.0, 28.0, 8.0 / 3.0]),
                                    3.0, 0.02, Tl)
    idx = np.arange(0, Tl, 4)
    obs = np.asarray(xs_l)[idx, 1:] + 0.5 * np.random.default_rng(0).standard_normal((len(idx), 2))
    data = np.column_stack([idx * 0.02, obs])
    ysl, Hsl, Rsl, csl = map(lambda z: jnp.asarray(z, jnp.float32),
                             lorenz.observations_model(data, 0.5, Tl, 4))
    i_, k_ = lorenz.get_gibbs_kernel(ysl, Hsl, Rsl, csl, m0, P0, 3.0, 0.02,
                                     100.0, True)
    x0l = lorenz.init_x_fn(jnp.asarray(data, jnp.float32), Tl)

    def init_l(x):
        return i_(x, jnp.zeros(3, jnp.float32))

    ok &= _run("lorenz gibbs (whiteners + extended)", init_l, k_,
               x0l.astype(jnp.float32), jnp.float32(1e-5),
               chex_rate=(0.0, 1.0))

    print("\nALL FAMILIES SMOKE-PASS ON HARDWARE" if ok
          else "\nSMOKE FAILURES — see above")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
