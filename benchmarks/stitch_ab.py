"""A/B the level-0 stitching draw strategies at the large-N PIT config.

`pit_profile.py` showed the fused `stitch_draws` launch dominating the
N=4096 step (182 ms per 512-node level vs 29 ms for the N^2 block-mass
pass): its per-draw row-payload selection is a one-hot matmul contracting
over the full N at HIGHEST precision. This script times every draw strategy
on identical level-0 inputs so the dispatch thresholds in `kernels/pit.py`
can be set from measurements.

  masses        block_masses (shared by the blocked variants)
  fused         stitch_draws (single launch, one-hot payload selection)
  unfused       categorical_from_uniforms + take_rows + blocked_col_sample
  twopass       row_lse + categorical_from_uniforms + take_rows + col_sample

`python benchmarks/stitch_ab.py [N] [P] [k]` (default 4096 512 1).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
P = int(sys.argv[2]) if len(sys.argv) > 2 else 512
K = int(sys.argv[3]) if len(sys.argv) > 3 else 1
N_ITER = 5


def _timeit(fn, *args):
    # Tunnel-safe median timing — see utils/profiling.timeit_ms.
    from aux_ssm_tpu.utils.profiling import timeit_ms
    return timeit_ms(fn, *args, n_iter=N_ITER)


def main():
    import jax
    import jax.numpy as jnp
    from jax.scipy.special import logsumexp
    from aux_ssm_tpu.ops.pallas import stitching as st
    from aux_ssm_tpu.ops.take import take_rows, categorical_from_uniforms

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    kf = jax.random.split(jax.random.key(0), 6)
    rf = 0.3 * jax.random.normal(kf[0], (P, N, K))
    cf = 0.3 * jax.random.normal(kf[1], (P, N, K))
    rb = -0.5 * jnp.sum(rf ** 2, -1)
    cb = -0.5 * jnp.sum(cf ** 2, -1)
    u_rows = jax.random.uniform(kf[2], (P, N))
    seed = jnp.int32(12345)

    masses = st.block_masses if on_tpu else st.block_masses_xla
    report = {}
    report["masses"] = _timeit(lambda a, b, c: masses(a, b, c).sum(), rf, cf, cb)
    Lb = jax.jit(masses)(rf, cf, cb)
    row_logits = rb + logsumexp(Lb, axis=-1)

    draw = st.stitch_draws if on_tpu else st.stitch_draws_xla

    def fused(rl, ur, lb, rf_, cf_, cb_):
        rows, cols = draw(seed, rl, ur, lb, rf_, cf_, cb_)
        return rows.sum() + cols.sum()

    report["fused"] = _timeit(fused, row_logits, u_rows, Lb, rf, cf, cb)

    def unfused(rl, ur, lb, rf_, cf_, cb_):
        rows = categorical_from_uniforms(rl, ur)
        rf_sel = take_rows(rf_, rows)
        cols = st.blocked_col_sample(seed, rows, lb, rf_sel, cf_, cb_)
        return rows.sum() + cols.sum()

    report["unfused"] = _timeit(unfused, row_logits, u_rows, Lb, rf, cf, cb)

    col_sample = st.col_sample if on_tpu else st.col_sample_xla

    def twopass(rb_, cb_, ur, rf_, cf_):
        lse = (st.row_lse(rf_, cf_, cb_) if on_tpu
               else st.row_lse_xla(rf_, cf_, cb_))
        rows = categorical_from_uniforms(rb_ + lse, ur)
        rf_sel = take_rows(rf_, rows)
        cols = col_sample(seed, rf_sel, cf_, cb_)
        return rows.sum() + cols.sum()

    report["twopass"] = _timeit(twopass, rb, cb, u_rows, rf, cf)

    def joint(rb_, ur, lb, rf_, cf_, cb_):
        rows, blocks, rf_sel = st.joint_rowblock_draws(ur, rb_, lb,
                                                       row_feat=rf_)
        cols = st.within_block_cols(seed, blocks, rf_sel, cf_, cb_)
        return rows.sum() + cols.sum()

    report["joint"] = _timeit(joint, rb, u_rows, Lb, rf, cf, cb)

    for name, ms in report.items():
        print(json.dumps({"variant": name, "ms": round(ms, 2),
                          "N": N, "P": P, "k": K}), flush=True)


if __name__ == "__main__":
    main()
