"""Guided-cSMC throughput: SV csmc-guided at the reference config
(T=250, D=30, N=25) — VERDICT r2 item 2's target path.

Usage: python benchmarks/guided_speed.py [n_iter]
Prints samples/s with host-read fences, best of 3 independently keyed
dispatches.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    sys.path.insert(0, ".")
    from aux_ssm_tpu.models import stochastic_volatility as sv

    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    T, D, N = 250, 30, 25
    NU, PHI, TAU, RHO = 0.0, 0.9, 2.0, 0.25
    _, ys = sv.get_data(jax.random.key(0), NU, PHI, TAU, RHO, D, T)

    init, kernel = sv.get_guided_csmc_kernel(ys, NU, PHI, TAU, RHO, N,
                                             backward=True)
    delta = jnp.full((T,), 5e-2, jnp.float32)

    def run(key, x, n):
        def body(st, k):
            st = kernel(k, st, delta)
            return st, jnp.mean(st.updated.astype(jnp.float32))
        keys = jax.random.split(key, n)
        st, upd = jax.lax.scan(body, init(x), keys)
        return st.x, jnp.mean(upd)

    run_jit = jax.jit(run, static_argnums=2)
    x0 = jnp.zeros((T, D), jnp.float32)
    x, acc = run_jit(jax.random.key(0), x0, n_iter)
    float(acc)

    best = float("inf")
    for i in range(3):
        tic = time.perf_counter()
        x, acc = run_jit(jax.random.key(1 + i), x, n_iter)
        a = float(acc)
        toc = time.perf_counter()
        best = min(best, toc - tic)
    print(f"csmc-guided T={T} D={D} N={N}: {n_iter / best:.1f} samples/s "
          f"(update rate {a:.3f})")


if __name__ == "__main__":
    main()
