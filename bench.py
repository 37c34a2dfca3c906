"""Headline benchmark: auxiliary-Kalman sampler throughput on a T=1024, d=16
LGSSM (BASELINE.md metric: samples/sec/chip), parallel-in-time filtering +
backward sampling, f32, single chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.json "published": {}), so
vs_baseline is null.
"""
import json
import time

import jax
import jax.numpy as jnp


def main():
    import __graft_entry__ as graft
    from aux_ssm_tpu.kernels.kalman import get_kernel

    T, dx = 1024, 16
    dyn, obs, target_fn = graft._build_lgssm_model(T, dx)
    init, kernel = get_kernel(dyn, obs, target_fn, parallel=True)

    delta = jnp.float32(0.05)

    def run(key, x, n):
        def body(carry, k):
            st = kernel(k, carry, delta)
            return st, st.updated

        keys = jax.random.split(key, n)
        st, upd = jax.lax.scan(body, init(x), keys)
        return st.x, jnp.mean(upd.astype(jnp.float32))

    n_iter = 200
    run_jit = jax.jit(run, static_argnums=2)
    x0 = jnp.zeros((T, dx), jnp.float32)

    # Warm-up / compile. Timing fences are host reads (float(acc)): on the
    # remote-TPU tunnel backend `block_until_ready` can return one in-flight
    # computation early, while materialising any output on the host is
    # reliable.
    x_w, acc = run_jit(jax.random.key(0), x0, n_iter)
    float(acc)

    # Best-of-k, independently keyed single dispatches: the TPU-side work is
    # deterministic per dispatch, so the MINIMUM wall-clock is the honest
    # device throughput — larger times are host/tunnel contention (a single
    # timed dispatch was measured 30% load-sensitive in round 2).
    k = 5
    best = float("inf")
    for i in range(k):
        tic = time.perf_counter()
        x_w, acc = run_jit(jax.random.key(1 + i), x_w, n_iter)
        float(acc)
        toc = time.perf_counter()
        best = min(best, toc - tic)

    samples_per_sec = n_iter / best
    print(json.dumps({
        "metric": "aux_kalman_samples_per_sec_T1024_d16",
        "value": round(float(samples_per_sec), 3),
        "unit": "samples/s/chip",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
