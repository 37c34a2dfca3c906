"""Headline benchmark: auxiliary-Kalman sampler on a T=1024, d=16 LGSSM —
BOTH BASELINE.md metrics: samples/sec/chip (parallel-in-time filtering +
backward sampling, f32, single chip) and ESS/sec (second-order factory,
adapted-then-frozen delta, via benchmarks/headline_ess.run_one).

Prints the headline JSON line {"metric", "value", "unit", "vs_baseline"}
first (the driver parses the last/only line tail), then one more line for
ESS/sec. The reference publishes no numbers (BASELINE.json
"published": {}), so vs_baseline is null.
"""
import json
import os
import sys
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
    }), flush=True)


def ess_line():
    """Second metric line (BASELINE: 'samples/sec/chip AND ESS/sec'):
    kalman-2 ESS/sec on the same T=1024 d=16 model, adapted-then-frozen
    delta at target alpha 0.5 (the headline_ess.py methodology)."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "benchmarks"))
    from headline_ess import run_one
    r = run_one(order=2, alpha=0.5)
    print(json.dumps({
        "metric": "aux_kalman2_ess_per_sec_T1024_d16",
        "value": r["ess_per_sec"],
        "unit": "ESS/s/chip",
        "vs_baseline": None,
    }), flush=True)


if __name__ == "__main__":
    # ESS first so the throughput line stays last (the driver's parsed
    # headline metric, comparable to BENCH_r01..r03). A failure in the ESS
    # leg must not take down the headline metric.
    try:
        ess_line()
    except Exception as e:  # pragma: no cover
        print(json.dumps({"metric": "aux_kalman2_ess_per_sec_T1024_d16",
                          "error": f"{type(e).__name__}: {e}"}), flush=True)
    main()
