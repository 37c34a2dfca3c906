"""Unit tests for the fused (factorised) PIT stitching path.

Covers, bottom-up:
- pair-factorisation helpers reproduce the dense pairwise Gaussian logpdf
  matrix exactly (diagonal and full-covariance forms);
- `row_lse_xla` and the Pallas `row_lse` (interpret mode) match a dense
  logsumexp;
- `col_sample_xla` and the Pallas `col_sample` (interpret mode) are
  bit-identical, and the draws follow the exact conditional categorical law;
- the fused stitching operator's pair law matches the dense N^2 softmax
  (empirical frequencies over many seeds vs exact joint probabilities).
"""
import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aux_ssm_tpu.kernels.csmc_base import (
    diag_gaussian_pair_factors, chol_gaussian_pair_factors,
)
from aux_ssm_tpu.ops.pallas import stitching as st


def _dense_scores(rf, cf, cb):
    return rf @ cf.T + cb[None, :]


def test_diag_pair_factors_match_dense():
    rng = np.random.default_rng(0)
    N, d = 7, 3
    mean_prev = jnp.asarray(rng.standard_normal((N, d)))
    x_next = jnp.asarray(rng.standard_normal((N, d)))
    sig = jnp.asarray(rng.uniform(0.5, 1.5, d))

    rf, cf, rb, cb = diag_gaussian_pair_factors(mean_prev, x_next, sig)
    got = rb[:, None] + cb[None, :] + rf @ cf.T

    from jax.scipy.stats import norm
    want = jax.vmap(
        jax.vmap(lambda m, x: jnp.sum(norm.logpdf(x, m, sig)), in_axes=(None, 0)),
        in_axes=(0, None),
    )(mean_prev, x_next)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-10)


def test_chol_pair_factors_match_dense():
    rng = np.random.default_rng(1)
    N, d = 6, 3
    mean_prev = jnp.asarray(rng.standard_normal((N, d)))
    x_next = jnp.asarray(rng.standard_normal((N, d)))
    A = rng.standard_normal((d, d))
    chol = jnp.asarray(np.linalg.cholesky(A @ A.T + d * np.eye(d)))

    rf, cf, rb, cb = chol_gaussian_pair_factors(mean_prev, x_next, chol)
    got = rb[:, None] + cb[None, :] + rf @ cf.T

    from aux_ssm_tpu.ops import mvn
    want = jax.vmap(
        jax.vmap(lambda m, x: mvn.logpdf(x, m, chol), in_axes=(None, 0)),
        in_axes=(0, None),
    )(mean_prev, x_next)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9)


@pytest.mark.parametrize("N", [5, 130, 256])
def test_row_lse_xla_matches_dense(N):
    rng = np.random.default_rng(2)
    P, k = 3, 4
    rf = jnp.asarray(rng.standard_normal((P, N, k)))
    cf = jnp.asarray(rng.standard_normal((P, N, k)))
    cb = jnp.asarray(rng.standard_normal((P, N)))

    want = np.stack([
        np.asarray(jax.scipy.special.logsumexp(_dense_scores(rf[p], cf[p], cb[p]), axis=1))
        for p in range(P)
    ])
    got = st.row_lse_xla(rf, cf, cb, block=64)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10)


def test_row_lse_pallas_interpret_matches_xla():
    rng = np.random.default_rng(3)
    P, N, k = 2, 256, 4
    rf = jnp.asarray(rng.standard_normal((P, N, k)), dtype=jnp.float32)
    cf = jnp.asarray(rng.standard_normal((P, N, k)), dtype=jnp.float32)
    cb = jnp.asarray(rng.standard_normal((P, N)), dtype=jnp.float32)

    got = st.row_lse(rf, cf, cb, interpret=True)
    want = st.row_lse_xla(rf, cf, cb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


def test_col_sample_pallas_interpret_bitwise_matches_xla():
    rng = np.random.default_rng(4)
    P, n, N, k = 2, 128, 256, 3
    rf = jnp.asarray(rng.standard_normal((P, n, k)), dtype=jnp.float32)
    cf = jnp.asarray(rng.standard_normal((P, N, k)), dtype=jnp.float32)
    cb = jnp.asarray(rng.standard_normal((P, N)), dtype=jnp.float32)
    seed = jnp.asarray(1234, dtype=jnp.int32)

    got = st.col_sample(seed, rf, cf, cb, interpret=True)
    want = st.col_sample_xla(seed, rf, cf, cb)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_col_sample_law():
    """Empirical frequencies of the Gumbel-argmax column draws must match the
    exact conditional categorical softmax(rf_i . cf + cb)."""
    rng = np.random.default_rng(5)
    N, k = 8, 2
    n_seeds = 4000
    rf = jnp.asarray(rng.standard_normal((1, 1, k)), dtype=jnp.float32)
    cf = jnp.asarray(rng.standard_normal((1, N, k)), dtype=jnp.float32)
    cb = jnp.asarray(rng.standard_normal((1, N)), dtype=jnp.float32)

    s = _dense_scores(np.asarray(rf[0]), np.asarray(cf[0]), np.asarray(cb[0]))[0]
    p = np.exp(s - s.max())
    p /= p.sum()

    draw = jax.jit(lambda sd: st.col_sample_xla(sd, rf, cf, cb)[0, 0])
    seeds = jnp.arange(n_seeds, dtype=jnp.int32)
    idx = np.asarray(jax.vmap(draw)(seeds))
    freq = np.bincount(idx, minlength=N) / n_seeds
    # 4000 draws: MC-SE of each frequency <= 0.5/sqrt(4000) ~ 0.008.
    np.testing.assert_allclose(freq, p, atol=4 * 0.008)


@pytest.mark.parametrize("N", [128, 256])
def test_block_masses_xla_matches_dense(N):
    rng = np.random.default_rng(8)
    P, k = 2, 3
    rf = jnp.asarray(rng.standard_normal((P, N, k)), dtype=jnp.float32)
    cf = jnp.asarray(rng.standard_normal((P, N, k)), dtype=jnp.float32)
    cb = jnp.asarray(rng.standard_normal((P, N)), dtype=jnp.float32)

    got = st.block_masses_xla(rf, cf, cb)
    nb = N // 128
    for p in range(P):
        s = _dense_scores(np.asarray(rf[p], np.float64),
                          np.asarray(cf[p], np.float64),
                          np.asarray(cb[p], np.float64))
        want = np.stack([
            np.log(np.exp(s[:, b * 128:(b + 1) * 128]
                          - s.max(1, keepdims=True)).sum(1))
            + s.max(1) for b in range(nb)
        ], axis=1)
        np.testing.assert_allclose(np.asarray(got[p]), want,
                                   rtol=1e-4, atol=1e-5)
    # Row-LSE consistency with the two-pass kernel's law.
    lse = jax.scipy.special.logsumexp(got, axis=-1)
    want_lse = st.row_lse_xla(rf, cf, cb)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(want_lse),
                               rtol=1e-5, atol=1e-5)


def test_block_masses_pallas_interpret_matches_xla():
    rng = np.random.default_rng(9)
    P, N, k = 2, 256, 2
    rf = jnp.asarray(rng.standard_normal((P, N, k)), dtype=jnp.float32)
    cf = jnp.asarray(rng.standard_normal((P, N, k)), dtype=jnp.float32)
    cb = jnp.asarray(rng.standard_normal((P, N)), dtype=jnp.float32)

    got = st.block_masses(rf, cf, cb, interpret=True)
    want = st.block_masses_xla(rf, cf, cb)
    # The kernel's per-block cross-lane tree sum vs the twin's linear matmul
    # accumulation: association-only difference, ~1e-5 worst-case on the
    # log-masses over 128 nonnegative terms.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-5, atol=5e-5)


def test_block_masses_suppressed_block_flushes_to_neg_inf():
    """A strongly suppressed column block (every column ~88+ log-units under
    the row max): e = exp(s - m) is f32-SUBNORMAL (below ~2^-126 from gap
    ~87.3). The XLA twin's matmul accumulation flushes such operands to
    zero -> log-mass exactly -inf; the kernel's VPU slice-sum flushes on TPU
    hardware but may keep the tiny finite value (~gap - log-ish) where the
    arithmetic honours subnormals (CPU interpret). Pin the contract both
    ways: the suppressed block's mass is <= -(gap - log(128)) or -inf, the
    row LSE is unaffected, and blocked draws never select the block —
    downstream is -inf-tolerant AND tiny-finite-tolerant."""
    N, k = 256, 1
    rf = jnp.ones((1, N, k), jnp.float32)
    cf = jnp.zeros((1, N, k), jnp.float32)

    def masses(gap):
        cb = jnp.concatenate(
            [jnp.zeros((1, 128)), jnp.full((1, 128), -float(gap))],
            axis=1).astype(jnp.float32)
        return (st.block_masses_xla(rf, cf, cb),
                st.block_masses(rf, cf, cb, interpret=True))

    # gap 87: e ~ 1.6e-38 is f32-normal — both paths finite and matching.
    want87, got87 = masses(87)
    assert np.all(np.isfinite(np.asarray(want87)))
    np.testing.assert_allclose(np.asarray(got87), np.asarray(want87),
                               rtol=5e-5, atol=5e-5)

    # gap 95: e ~ 5.5e-42 is f32-subnormal — the matmul twin FTZs to -inf;
    # the kernel's slice sum is -inf on TPU, finite ~-90.1 where subnormals
    # survive. Either value carries probability 0.
    want95, got95 = masses(95)
    assert np.all(np.asarray(want95[..., 1]) == -np.inf)
    assert np.all(np.asarray(got95[..., 1]) <= -88.0)
    np.testing.assert_allclose(np.asarray(got95[..., 0]),
                               np.asarray(want95[..., 0]), rtol=5e-5)

    # Row LSE is unchanged (block 0 dominates by ~90 log-units).
    lse_got = jax.scipy.special.logsumexp(got95, axis=-1)
    lse_want = jax.scipy.special.logsumexp(want95, axis=-1)
    np.testing.assert_allclose(np.asarray(lse_got), np.asarray(lse_want),
                               rtol=5e-5)

    # Downstream joint (row, block) draws tolerate the suppressed mass
    # (-inf or tiny-finite) and never pick that block.
    rb = jnp.zeros((1, N), jnp.float32)
    u = jax.random.uniform(jax.random.key(0), (1, 64))
    _, blocks = st.joint_rowblock_draws(u, rb, got95)
    assert np.all(np.asarray(blocks) == 0)


@pytest.mark.parametrize("stage2", ["icdf", "gumbel"])
def test_blocked_col_sample_law(monkeypatch, stage2):
    """Block-then-within-block draws must follow the exact conditional
    categorical softmax(rf_i . cf + cb) — same law as `col_sample` — under
    BOTH within-group mappings (icdf default, legacy gumbel)."""
    monkeypatch.setenv("AUX_SSM_STAGE2", stage2)
    rng = np.random.default_rng(10)
    N, k = 256, 2
    n_seeds = 4000
    rf = jnp.asarray(rng.standard_normal((1, 1, k)), dtype=jnp.float32)
    cf = jnp.asarray(0.3 * rng.standard_normal((1, N, k)), dtype=jnp.float32)
    cb = jnp.asarray(rng.standard_normal((1, N)), dtype=jnp.float32)
    rows = jnp.zeros((1, 1), jnp.int32)
    rf_full = jnp.broadcast_to(rf, (1, N, k))

    s = _dense_scores(np.asarray(rf[0]), np.asarray(cf[0]), np.asarray(cb[0]))[0]
    p = np.exp(s - s.max())
    p /= p.sum()

    Lb = st.block_masses_xla(rf_full, cf, cb)

    draw = jax.jit(lambda sd: st.blocked_col_sample(sd, rows, Lb, rf, cf, cb)[0, 0])
    idx = np.asarray(jax.vmap(draw)(jnp.arange(n_seeds, dtype=jnp.int32)))
    freq = np.bincount(idx, minlength=N) / n_seeds
    # Aggregate into 8 coarse bins to keep per-bin MC-SE meaningful.
    fb = freq.reshape(8, -1).sum(1)
    pb = p.reshape(8, -1).sum(1)
    np.testing.assert_allclose(fb, pb, atol=5 * 0.5 / np.sqrt(n_seeds))


def test_within_group_cols_512_law():
    """`within_block_cols(group=512)` (the within-super column stage of the
    super-aggregated joint draw) must follow the exact conditional
    categorical softmax(rf_row . cf + cb) over the 512 columns of the
    chosen super."""
    rng = np.random.default_rng(40)
    N, k = 512, 2
    rf_row = jnp.asarray(rng.standard_normal((1, 1, k)), jnp.float32)
    cf = jnp.asarray(0.3 * rng.standard_normal((1, N, k)), jnp.float32)
    cb = jnp.asarray(rng.standard_normal((1, N)), jnp.float32)
    groups = jnp.zeros((1, 1), jnp.int32)      # single 512-super

    s = _dense_scores(np.asarray(rf_row[0]), np.asarray(cf[0]),
                      np.asarray(cb[0]))[0]
    p = np.exp(s - s.max())
    p /= p.sum()

    draw = jax.jit(lambda sd: st.within_block_cols(
        sd, groups, rf_row, cf, cb, group=512)[0, 0])
    n_seeds = 4000
    idx = np.asarray(jax.vmap(draw)(jnp.arange(n_seeds, dtype=jnp.int32)))
    freq = np.bincount(idx, minlength=N) / n_seeds
    fb = freq.reshape(8, -1).sum(1)
    pb = p.reshape(8, -1).sum(1)
    np.testing.assert_allclose(fb, pb, atol=5 * 0.5 / np.sqrt(n_seeds))


def test_super_node_draw_law_matches_dense_joint(monkeypatch):
    """`_fused_node_draw` with the super-aggregated stage 1 forced
    (AUX_SSM_COL_SUPER=512 at N=512) must follow the same flat N^2 softmax
    law as every other engine."""
    from aux_ssm_tpu.kernels import pit as pit_mod
    from aux_ssm_tpu.kernels.csmc_base import Potential

    monkeypatch.setenv("AUX_SSM_STITCH", "blocked")
    monkeypatch.setenv("AUX_SSM_STITCH_DRAWS", "joint")
    monkeypatch.setenv("AUX_SSM_COL_SUPER", "512")

    rng = np.random.default_rng(41)
    N, d = 512, 1
    sig, phi = 0.9, 0.7

    @chex.dataclass
    class PairGt(Potential):
        prev_dependent = False
        supports_pairwise_factors = True

        def pairwise_factors(self, x_left, x_right, params):
            return diag_gaussian_pair_factors(phi * x_left, x_right, sig)

    xl = jnp.asarray(rng.standard_normal((1, N, d)), dtype=jnp.float32)
    xr = jnp.asarray(rng.standard_normal((1, N, d)), dtype=jnp.float32)
    lw = jnp.zeros((1, N), jnp.float32)
    gt = PairGt(params=None)

    rf, cf, rb, cb = diag_gaussian_pair_factors(
        phi * np.asarray(xl[0], np.float64), np.asarray(xr[0], np.float64),
        sig)
    logw = np.asarray(rb)[:, None] + np.asarray(cb)[None, :] \
        + np.asarray(rf @ cf.T)
    pj = np.exp(logw - logw.max())
    pj /= pj.sum()
    pjb = pj.reshape(8, N // 8, 8, N // 8).sum((1, 3))

    def draw(seed):
        keys = jax.random.split(jax.random.key(seed), 1)
        rows, cols = pit_mod._fused_node_draw(
            xl, xr, lw, lw, None, keys, gt, N, False, False)
        return rows[0, 1], cols[0, 1]

    draw_j = jax.jit(draw)
    n_seeds = 3000
    counts = np.zeros((8, 8))
    for seed in range(n_seeds):
        li, ri = draw_j(seed)
        counts[int(li) * 8 // N, int(ri) * 8 // N] += 1.0
    np.testing.assert_allclose(counts / n_seeds, pjb,
                               atol=5 * 0.5 / np.sqrt(n_seeds))


def test_joint_rowblock_draws_law():
    """`joint_rowblock_draws` must follow P(i, b) ∝ exp(rb_i + Lb_ib)."""
    rng = np.random.default_rng(30)
    N, k = 256, 2
    rf = jnp.asarray(0.4 * rng.standard_normal((1, N, k)), jnp.float32)
    cf = jnp.asarray(0.4 * rng.standard_normal((1, N, k)), jnp.float32)
    cb = jnp.asarray(rng.standard_normal((1, N)), jnp.float32)
    rb = jnp.asarray(rng.standard_normal((1, N)), jnp.float32)
    Lb = st.block_masses_xla(rf, cf, cb)                    # (1, N, 2)
    nb = Lb.shape[-1]

    M = np.asarray(Lb[0], np.float64) + np.asarray(rb[0], np.float64)[:, None]
    pj = np.exp(M - M.max())
    pj /= pj.sum()                                           # (N, nb)
    # Coarse row bins x exact block for the frequency check.
    pjb = pj.reshape(8, N // 8, nb).sum(1)                   # (8, nb)

    n_draws = 40_000
    u = jax.random.uniform(jax.random.key(0), (1, n_draws))
    rows, blocks = st.joint_rowblock_draws(u, rb, Lb)
    rows, blocks = np.asarray(rows[0]), np.asarray(blocks[0])
    counts = np.zeros((8, nb))
    np.add.at(counts, (rows * 8 // N, blocks), 1.0)
    np.testing.assert_allclose(counts / n_draws, pjb,
                               atol=5 * 0.5 / np.sqrt(n_draws))


@pytest.mark.parametrize("draws_mode", ["joint", "fused", "unfused"])
def test_blocked_node_draw_law_matches_dense_joint(monkeypatch, draws_mode):
    """`_fused_node_draw` under AUX_SSM_STITCH=blocked must follow the same
    flat N^2 softmax law as the two-pass path (non-pinned slots), whichever
    draw engine runs."""
    from aux_ssm_tpu.kernels import pit as pit_mod
    from aux_ssm_tpu.kernels.csmc_base import Potential

    monkeypatch.setenv("AUX_SSM_STITCH", "blocked")
    monkeypatch.setenv("AUX_SSM_STITCH_DRAWS", draws_mode)

    rng = np.random.default_rng(11)
    N, d = 128, 1
    sig, phi = 0.9, 0.7

    @chex.dataclass
    class PairGt(Potential):
        prev_dependent = False
        supports_pairwise_factors = True

        def pairwise_factors(self, x_left, x_right, params):
            return diag_gaussian_pair_factors(phi * x_left, x_right, sig)

    xl = jnp.asarray(rng.standard_normal((1, N, d)), dtype=jnp.float32)
    xr = jnp.asarray(rng.standard_normal((1, N, d)), dtype=jnp.float32)
    lw = jnp.zeros((1, N), jnp.float32)
    params = jnp.zeros((1,))
    gt = PairGt(params=None)

    rf, cf, rb, cb = diag_gaussian_pair_factors(
        phi * np.asarray(xl[0], np.float64), np.asarray(xr[0], np.float64),
        sig)
    logw = np.asarray(rb)[:, None] + np.asarray(cb)[None, :] \
        + np.asarray(rf @ cf.T)
    pj = np.exp(logw - logw.max())
    pj /= pj.sum()
    # Coarse 8x8 block marginals for the frequency test.
    pjb = pj.reshape(8, N // 8, 8, N // 8).sum((1, 3))

    def draw(seed):
        keys = jax.random.split(jax.random.key(seed), 1)
        rows, cols = pit_mod._fused_node_draw(
            xl, xr, lw, lw, params, keys, gt, N, False, False)
        return rows[0, 1], cols[0, 1]      # slot 1: first unpinned pair

    draw_j = jax.jit(draw)
    n_seeds = 3000
    counts = np.zeros((8, 8))
    for seed in range(n_seeds):
        li, ri = draw_j(seed)
        counts[int(li) * 8 // N, int(ri) * 8 // N] += 1.0
    np.testing.assert_allclose(counts / n_seeds, pjb,
                               atol=5 * 0.5 / np.sqrt(n_seeds))


def test_fused_operator_law_matches_dense_joint():
    """The fused two-stage draw over one tree node must follow the exact flat
    N^2 softmax of w_ij = rb_i + cb_j + rf_i . cf_j (for non-pinned slots)."""
    from aux_ssm_tpu.kernels.pit import fused_stitching_operator
    from aux_ssm_tpu.kernels.csmc_base import Potential

    rng = np.random.default_rng(6)
    N, d, block = 4, 1, 1
    sig = 0.9
    phi = 0.7

    @chex.dataclass
    class PairGt(Potential):
        prev_dependent = False
        supports_pairwise_factors = True

        def __call__(self, x_next, x_t, params):
            from jax.scipy.stats import norm
            return jnp.sum(norm.logpdf(x_next, phi * x_t, sig), -1)

        def pairwise_factors(self, x_left, x_right, params):
            return diag_gaussian_pair_factors(phi * x_left, x_right, sig)

    xl = jnp.asarray(rng.standard_normal((1, block, N, d)))
    xr = jnp.asarray(rng.standard_normal((1, block, N, d)))
    lw_a = jnp.asarray(np.log(rng.uniform(0.5, 1.0, (1, block, N))))
    lw_b = jnp.asarray(np.log(rng.uniform(0.5, 1.0, (1, block, N))))
    orig = jnp.tile(jnp.arange(N), (1, block, 1))
    params = jnp.zeros((1, block))

    # Exact joint law.
    rf, cf, rb, cb = diag_gaussian_pair_factors(
        phi * xl[0, -1], xr[0, 0], sig)
    logw = (rb + np.asarray(lw_a[0, -1]))[:, None] \
        + (cb + np.asarray(lw_b[0, 0]))[None, :] + np.asarray(rf @ cf.T)
    pj = np.exp(logw - logw.max())
    pj /= pj.sum()

    gt = PairGt(params=None)

    counts = np.zeros((N, N))
    n_seeds = 3000
    def draw(seed):
        keys_a = jax.random.split(jax.random.key(seed), block)[None]
        keys_b = jax.random.split(jax.random.key(seed + 10 ** 6), block)[None]
        ia = ((xl, lw_a, orig), keys_a, params)
        ib = ((xr, lw_b, orig), keys_b, params)
        (traj, _, origins), _, _ = fused_stitching_operator(
            ia, ib, gt, N, False, False)
        # slot 1..N-1 are iid joint draws; read back the chosen indices from
        # the origins bookkeeping.
        return origins[0, 0], origins[0, 1]

    draw_j = jax.jit(draw)
    for seed in range(n_seeds):
        li, ri = draw_j(seed)
        li, ri = np.asarray(li), np.asarray(ri)
        counts[li[1], ri[1]] += 1.0  # slot 1: first unpinned iid pair

    freq = counts / n_seeds
    np.testing.assert_allclose(freq, pj, atol=5 * 0.5 / np.sqrt(n_seeds))


def test_fused_operator_pins_reference_pair():
    """Slot 0 must always select pair (0, 0) — the conditional property that
    keeps the reference trajectory alive."""
    from aux_ssm_tpu.kernels.pit import fused_stitching_operator
    from aux_ssm_tpu.kernels.csmc_base import Potential

    rng = np.random.default_rng(7)
    N, d, block = 6, 2, 2

    @chex.dataclass
    class PairGt(Potential):
        prev_dependent = False
        supports_pairwise_factors = True

        def pairwise_factors(self, x_left, x_right, params):
            return diag_gaussian_pair_factors(x_left, x_right, 1.0)

    xl = jnp.asarray(rng.standard_normal((1, block, N, d)))
    xr = jnp.asarray(rng.standard_normal((1, block, N, d)))
    lw = jnp.full((1, block, N), -np.log(N))
    orig = jnp.tile(jnp.arange(N), (1, block, 1))
    params = jnp.zeros((1, block))
    gt = PairGt(params=None)

    for seed in range(10):
        keys_a = jax.random.split(jax.random.key(seed), block)[None]
        keys_b = jax.random.split(jax.random.key(seed + 99), block)[None]
        ia = ((xl, lw, orig), keys_a, params)
        ib = ((xr, lw, orig), keys_b, params)
        (_, _, origins), _, _ = fused_stitching_operator(
            ia, ib, gt, N, False, False)
        assert int(origins[0, 0, 0]) == 0 and int(origins[0, block, 0]) == 0


# --------------------------------------------------------------------------
# Fused stage-1 + stage-2 draws (stitch_draws)
# --------------------------------------------------------------------------

def _draws_inputs(N, k, P=2, seed=20):
    rng = np.random.default_rng(seed)
    rf = jnp.asarray(0.4 * rng.standard_normal((P, N, k)), jnp.float32)
    cf = jnp.asarray(0.4 * rng.standard_normal((P, N, k)), jnp.float32)
    cb = jnp.asarray(rng.standard_normal((P, N)), jnp.float32)
    rb = jnp.asarray(rng.standard_normal((P, N)), jnp.float32)
    Lb = st.block_masses_xla(rf, cf, cb)
    row_logits = rb + jax.scipy.special.logsumexp(Lb, axis=-1)
    u_rows = jax.random.uniform(jax.random.key(seed), (P, N))
    return rf, cf, cb, Lb, row_logits, u_rows


def test_stitch_draws_interpret_matches_xla():
    N, k = 256, 2
    rf, cf, cb, Lb, row_logits, u_rows = _draws_inputs(N, k)
    seed = jnp.int32(13)
    got = st.stitch_draws(seed, row_logits, u_rows, Lb, rf, cf, cb,
                          pair_offset=3, interpret=True)
    want = st.stitch_draws_xla(seed, row_logits, u_rows, Lb, rf, cf, cb,
                               pair_offset=3)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))


def test_stitch_draws_nb1_edge():
    """N = 128 (a single column block) must work in both paths."""
    N, k = 128, 1
    rf, cf, cb, Lb, row_logits, u_rows = _draws_inputs(N, k, seed=21)
    seed = jnp.int32(5)
    got = st.stitch_draws(seed, row_logits, u_rows, Lb, rf, cf, cb,
                          interpret=True)
    want = st.stitch_draws_xla(seed, row_logits, u_rows, Lb, rf, cf, cb)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))


def test_stitch_draws_rows_law():
    """Stage-1 rows must follow Cat(softmax(row_logits))."""
    N, k = 256, 1
    rf, cf, cb, Lb, row_logits, _ = _draws_inputs(N, k, P=1, seed=22)
    p = np.asarray(jax.nn.softmax(row_logits[0]))

    def draw(key):
        u = jax.random.uniform(key, (1, N))
        rows, _ = st.stitch_draws_xla(jnp.int32(1), row_logits, u, Lb,
                                      rf, cf, cb)
        return rows[0]

    n_rep = 200
    rows = np.asarray(jax.vmap(draw)(
        jax.random.split(jax.random.key(0), n_rep))).ravel()
    freq = np.bincount(rows, minlength=N) / rows.size
    fb = freq.reshape(8, -1).sum(1)
    pb = p.reshape(8, -1).sum(1)
    np.testing.assert_allclose(fb, pb, atol=5 * 0.5 / np.sqrt(rows.size))


def test_stitch_draws_cols_law_matches_conditional():
    """Stage-2 cols given a pinned row must follow the exact conditional
    categorical softmax(rf_row . cf + cb)."""
    N, k = 256, 2
    rng = np.random.default_rng(23)
    rf_row = jnp.asarray(rng.standard_normal((1, k)), jnp.float32)
    rf = jnp.broadcast_to(rf_row[None], (1, N, k))
    cf = jnp.asarray(0.3 * rng.standard_normal((1, N, k)), jnp.float32)
    cb = jnp.asarray(rng.standard_normal((1, N)), jnp.float32)
    Lb = st.block_masses_xla(rf, cf, cb)
    # All rows identical -> any sampled row gives the same conditional.
    row_logits = jnp.zeros((1, N), jnp.float32)
    u_rows = jax.random.uniform(jax.random.key(3), (1, N))

    s = _dense_scores(np.asarray(rf[0, 0:1]), np.asarray(cf[0]),
                      np.asarray(cb[0]))[0]
    p = np.exp(s - s.max())
    p /= p.sum()

    draw = jax.jit(lambda sd: st.stitch_draws_xla(
        sd, row_logits, u_rows, Lb, rf, cf, cb)[1][0])
    n_seeds = 300
    cols = np.asarray(jax.vmap(draw)(
        jnp.arange(n_seeds, dtype=jnp.int32))).ravel()
    freq = np.bincount(cols, minlength=N) / cols.size
    fb = freq.reshape(8, -1).sum(1)
    pb = p.reshape(8, -1).sum(1)
    np.testing.assert_allclose(fb, pb, atol=5 * 0.5 / np.sqrt(cols.size))


def test_blocked_paths_tolerate_neg_inf_biases():
    """-inf column/row biases (indicator potentials, zero log-weights) must
    not NaN-poison the blocked draw paths: the one-hot payload matmuls see a
    finite floor, excluded columns are never drawn, and the law over the
    remaining columns is untouched. Regression: before the clamp, any -inf
    in cb made `within_block_cols`' selection matmul emit NaN scores."""
    rng = np.random.default_rng(77)
    N, k, n = 256, 2, 64
    rf = jnp.asarray(0.3 * rng.standard_normal((1, N, k)), jnp.float32)
    cf = jnp.asarray(0.3 * rng.standard_normal((1, N, k)), jnp.float32)
    cb = jnp.asarray(rng.standard_normal((1, N)), jnp.float32)
    # Kill a scattered set of columns AND one whole 128-column block, so Lb
    # itself contains a -inf block mass.
    dead = np.zeros(N, bool)
    dead[5] = dead[17] = dead[99] = True
    dead[128:] = True
    cb = cb.at[0, jnp.asarray(np.flatnonzero(dead))].set(-jnp.inf)
    rb = jnp.asarray(rng.standard_normal((1, N)), jnp.float32)

    Lb = st.block_masses_xla(rf, cf, cb)
    assert bool(jnp.isinf(Lb[0, 0, 1]))          # whole block 1 is empty

    # joint (row, block) draw + within-block columns — the default large-N
    # path (kernels/pit.py mode 'joint').
    u = jax.random.uniform(jax.random.key(0), (1, n))
    rows, blocks, rf_sel = st.joint_rowblock_draws(u, rb, Lb, row_feat=rf)
    cols_joint = st.within_block_cols(jnp.int32(3), blocks, rf_sel, cf, cb)
    assert np.all(np.asarray(blocks) == 0)
    assert not np.any(dead[np.asarray(cols_joint).ravel()])
    assert np.all(np.isfinite(np.asarray(rf_sel)))

    # unfused path: independent row draw + blocked_col_sample.
    rows_u = jnp.asarray(rng.integers(0, N, (1, n)), jnp.int32)
    rf_row = jnp.take_along_axis(rf, rows_u[:, :, None], axis=1)
    cols_b = st.blocked_col_sample(jnp.int32(5), rows_u, Lb, rf_row, cf, cb)
    assert not np.any(dead[np.asarray(cols_b).ravel()])

    # Law on the live columns is unchanged by the clamp: compare frequencies
    # against a dense softmax with the dead columns removed.
    rf1 = jnp.broadcast_to(rf[:, 0:1], (1, N, k))
    Lb1 = st.block_masses_xla(rf1, cf, cb)
    draw = jax.jit(lambda sd: st.blocked_col_sample(
        sd, jnp.zeros((1, 1), jnp.int32), Lb1, rf1[:, 0:1], cf, cb)[0, 0])
    n_seeds = 4000
    idx = np.asarray(jax.vmap(draw)(jnp.arange(n_seeds, dtype=jnp.int32)))
    assert not np.any(dead[idx])
    s = _dense_scores(np.asarray(rf1[0, 0:1]), np.asarray(cf[0]),
                      np.nan_to_num(np.asarray(cb[0]), neginf=-1e30))[0]
    p = np.exp(s - s.max())
    p /= p.sum()
    freq = np.bincount(idx, minlength=N) / n_seeds
    fb = freq[:128].reshape(8, -1).sum(1)
    pb = p[:128].reshape(8, -1).sum(1)
    np.testing.assert_allclose(fb, pb, atol=5 * 0.5 / np.sqrt(n_seeds))


@pytest.mark.parametrize("fast_take", ["0", "1"])
def test_payload_riding_matches_take_rows(monkeypatch, fast_take):
    """`joint_rowblock_draws(row_extra=...)` / `within_block_cols(col_extra=
    ...)` must return exactly take_along_axis(extra, rows/cols) — the
    boundary-value ride the stitch tree uses instead of separate scalar
    selects — on both the flat-fallback and the hierarchical tile paths,
    without changing the draws themselves."""
    monkeypatch.setenv("AUX_SSM_FAST_TAKE", fast_take)
    rng = np.random.default_rng(5)
    P, N, k, e, n = 2, 2048, 1, 2, 256   # N*nb/128 = 256 > 128: 3-level path
    rf = jnp.asarray(0.3 * rng.standard_normal((P, N, k)), jnp.float32)
    cf = jnp.asarray(0.3 * rng.standard_normal((P, N, k)), jnp.float32)
    cb = jnp.asarray(rng.standard_normal((P, N)), jnp.float32)
    rb = jnp.asarray(rng.standard_normal((P, N)), jnp.float32)
    rex = jnp.asarray(rng.standard_normal((P, N, e)), jnp.float32)
    cex = jnp.asarray(rng.standard_normal((P, N, e)), jnp.float32)
    Lb = st.block_masses_xla(rf, cf, cb)
    u = jax.random.uniform(jax.random.key(1), (P, n))

    base = jax.jit(lambda: st.joint_rowblock_draws(u, rb, Lb, row_feat=rf))()
    rows0, blocks0, rf_sel0 = base
    rows, blocks, rf_sel, rpay = jax.jit(lambda: st.joint_rowblock_draws(
        u, rb, Lb, row_feat=rf, row_extra=rex))()
    np.testing.assert_array_equal(np.asarray(rows), np.asarray(rows0))
    np.testing.assert_array_equal(np.asarray(blocks), np.asarray(blocks0))
    np.testing.assert_array_equal(np.asarray(rf_sel), np.asarray(rf_sel0))
    want_r = np.take_along_axis(np.asarray(rex),
                                np.asarray(rows)[:, :, None], axis=1)
    np.testing.assert_array_equal(np.asarray(rpay), want_r)

    cols0 = jax.jit(lambda: st.within_block_cols(
        jnp.int32(7), blocks, rf_sel, cf, cb))()
    cols, cpay = jax.jit(lambda: st.within_block_cols(
        jnp.int32(7), blocks, rf_sel, cf, cb, col_extra=cex))()
    np.testing.assert_array_equal(np.asarray(cols), np.asarray(cols0))
    want_c = np.take_along_axis(np.asarray(cex),
                                np.asarray(cols)[:, :, None], axis=1)
    np.testing.assert_array_equal(np.asarray(cpay), want_c)


def test_node_draw_payload_pinning(monkeypatch):
    """`_fused_node_draw` with payloads re-pins slot 0's values to index 0
    on every engine (joint rides the matmuls; fused/unfused take_rows)."""
    from aux_ssm_tpu.kernels import pit as pit_mod
    from aux_ssm_tpu.kernels.csmc_base import Potential

    monkeypatch.setenv("AUX_SSM_STITCH", "blocked")
    rng = np.random.default_rng(3)
    N, d = 128, 1
    sig, phi = 0.9, 0.7

    @chex.dataclass
    class PairGt(Potential):
        prev_dependent = False
        supports_pairwise_factors = True

        def pairwise_factors(self, x_left, x_right, params):
            return diag_gaussian_pair_factors(phi * x_left, x_right, sig)

    xl = jnp.asarray(rng.standard_normal((2, N, d)), dtype=jnp.float32)
    xr = jnp.asarray(rng.standard_normal((2, N, d)), dtype=jnp.float32)
    lw = jnp.zeros((2, N), jnp.float32)
    keys = jax.random.split(jax.random.key(0), 2)
    gt = PairGt(params=None)
    rex = jnp.asarray(rng.standard_normal((2, N, d)), jnp.float32)
    cex = jnp.asarray(rng.standard_normal((2, N, d)), jnp.float32)

    for mode in ["joint", "unfused"]:
        monkeypatch.setenv("AUX_SSM_STITCH_DRAWS", mode)
        rows0, cols0 = jax.jit(lambda: pit_mod._fused_node_draw(
            xl, xr, lw, lw, None, keys, gt, N, False, False))()
        rows, cols, rpay, cpay = jax.jit(lambda: pit_mod._fused_node_draw(
            xl, xr, lw, lw, None, keys, gt, N, False, False,
            row_payload=rex, col_payload=cex))()
        np.testing.assert_array_equal(np.asarray(rows), np.asarray(rows0)), mode
        np.testing.assert_array_equal(np.asarray(cols), np.asarray(cols0)), mode
        want_r = np.take_along_axis(np.asarray(rex),
                                    np.asarray(rows)[:, :, None], axis=1)
        want_c = np.take_along_axis(np.asarray(cex),
                                    np.asarray(cols)[:, :, None], axis=1)
        np.testing.assert_array_equal(np.asarray(rpay), want_r), mode
        np.testing.assert_array_equal(np.asarray(cpay), want_c), mode
        assert np.all(np.asarray(rows)[:, 0] == 0)
        np.testing.assert_array_equal(np.asarray(rpay)[:, 0],
                                      np.asarray(rex)[:, 0])
        np.testing.assert_array_equal(np.asarray(cpay)[:, 0],
                                      np.asarray(cex)[:, 0])
