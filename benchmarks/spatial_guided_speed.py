"""Spatial csmc-guided throughput at the reference config (T=1024, D=8,
N=25): the (B, N)-block lane kernel vs the generic scan
(MODE/AUX_SSM_FUSED_CSMC=0 for the A/B). Measured r3: 338.0 vs 49.6
samples/s (6.8x), identical update rates."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp
import numpy as np
from aux_ssm_tpu.models import spatial as sp

mode = os.environ.get("MODE", "auto")
T, D, N = 1024, 8, 25
rng = np.random.default_rng(0)
_, ys_np = sp.get_data(rng, 0.3, 1.0, -0.25, 4.0, D, T)
ys = jnp.asarray(ys_np, jnp.float32)
init, kernel = sp.get_guided_csmc_kernel(ys, 0.3, 4.0, -0.25, 1.0, D, N, backward=True)
delta = jnp.full((T,), 0.05, jnp.float32)

def run(key, x, n):
    def body(st, k):
        st = kernel(k, st, delta)
        return st, jnp.mean(st.updated.astype(jnp.float32))
    keys = jax.random.split(key, n)
    st, upd = jax.lax.scan(body, init(x), keys)
    return st.x, jnp.mean(upd)

run_jit = jax.jit(run, static_argnums=2)
x0 = jnp.zeros((T, D*D), jnp.float32)
n = 50
x, acc = run_jit(jax.random.key(0), x0, n); float(acc)
best = 1e9
for i in range(3):
    tic = time.perf_counter(); x, acc = run_jit(jax.random.key(1+i), x, n); a = float(acc); toc = time.perf_counter()
    best = min(best, toc - tic)
print(f"spatial csmc-guided T={T} D={D} N={N} [{mode}]: {n/best:.1f} samples/s (update {a:.3f})")
