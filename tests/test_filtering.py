import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aux_ssm_tpu.ops.filtering import filtering
from aux_ssm_tpu.ops.lgssm import LGSSM, log_likelihood, prior_logpdf

from oracles import explicit_filter, random_lgssm, simulate


def _make(seed, T, dx, dy, nan_frac=0.0):
    rng = np.random.default_rng(seed)
    params = random_lgssm(rng, T, dx, dy)
    ys = simulate(rng, *params)
    if nan_frac > 0:
        mask = rng.uniform(size=ys.shape) < nan_frac
        ys = np.where(mask, np.nan, ys)
    return params, ys


@pytest.mark.parametrize(
    "seed,T,dx,dy,parallel",
    [
        (s, T, dx, dy, p)
        for s, (T, dx, dy), p in itertools.product(
            [0, 7], [(3, 1, 1), (12, 2, 3), (25, 3, 2)], [False, True]
        )
    ],
)
def test_vs_explicit(seed, T, dx, dy, parallel):
    params, ys = _make(seed, T, dx, dy)
    ms_ref, Ps_ref, ell_ref = explicit_filter(ys, *params)

    lgssm = LGSSM(*map(jnp.asarray, params))
    ms, Ps, ell = filtering(jnp.asarray(ys), lgssm, parallel)

    np.testing.assert_allclose(ms, ms_ref, atol=1e-8, rtol=1e-8)
    np.testing.assert_allclose(Ps, Ps_ref, atol=1e-8, rtol=1e-8)
    np.testing.assert_allclose(ell, ell_ref, rtol=1e-8)


@pytest.mark.parametrize("parallel", [False, True])
@pytest.mark.parametrize("seed", [0, 3])
def test_missing_data_vs_row_deletion(seed, parallel):
    """NaN components must be handled exactly as if the rows were deleted."""
    params, ys = _make(seed, 20, 2, 3, nan_frac=0.35)
    # Also blank out whole steps.
    ys[5] = np.nan
    ys[11] = np.nan

    ms_ref, Ps_ref, ell_ref = explicit_filter(ys, *params)

    lgssm = LGSSM(*map(jnp.asarray, params))
    ms, Ps, ell = filtering(jnp.asarray(ys), lgssm, parallel)

    np.testing.assert_allclose(ms, ms_ref, atol=1e-8, rtol=1e-7)
    np.testing.assert_allclose(Ps, Ps_ref, atol=1e-8, rtol=1e-7)
    np.testing.assert_allclose(ell, ell_ref, rtol=1e-8)


@pytest.mark.parametrize("parallel", [False, True])
def test_batched_matches_blockdiag(parallel):
    """A batched (T,B,dx) LGSSM must match the block-diagonal (T,B*dx) model
    (consistency contract from reference test_filtering.py:63-107)."""
    rng = np.random.default_rng(5)
    T, B, dx, dy = 10, 3, 2, 2
    m0, P0, Fs, Qs, bs, Hs, Rs, cs = random_lgssm(rng, T, dx, dy, batched=True, B=B)
    ys = np.stack(
        [simulate(rng, m0[b], P0[b], Fs[:, b], Qs[:, b], bs[:, b], Hs[:, b], Rs[:, b], cs[:, b])
         for b in range(B)],
        axis=1,
    )

    def blockdiag(x):  # (T?, B, d1, d2) -> (T?, B*d1, B*d2)
        from scipy.linalg import block_diag
        if x.ndim == 3:  # (B, d1, d2) no time axis
            return block_diag(*x)
        return np.stack([block_diag(*x[t]) for t in range(x.shape[0])])

    big = (
        m0.reshape(-1), blockdiag(P0), blockdiag(Fs), blockdiag(Qs),
        bs.reshape(T - 1, -1), blockdiag(Hs), blockdiag(Rs), cs.reshape(T, -1),
    )
    ys_big = ys.reshape(T, -1)

    lg_b = LGSSM(*map(jnp.asarray, (m0, P0, Fs, Qs, bs, Hs, Rs, cs)))
    lg_big = LGSSM(*map(jnp.asarray, big))

    ms_b, Ps_b, ell_b = filtering(jnp.asarray(ys), lg_b, parallel)
    ms_big, Ps_big, ell_big = filtering(jnp.asarray(ys_big), lg_big, parallel)

    np.testing.assert_allclose(ms_b.reshape(T, -1), ms_big, atol=1e-8, rtol=1e-7)
    np.testing.assert_allclose(ell_b, ell_big, rtol=1e-8)
    for b in range(B):
        np.testing.assert_allclose(
            Ps_b[:, b], Ps_big[:, b * dx:(b + 1) * dx, b * dx:(b + 1) * dx],
            atol=1e-8, rtol=1e-7,
        )


def test_parallel_equals_sequential_large():
    params, ys = _make(11, 128, 4, 3, nan_frac=0.1)
    lgssm = LGSSM(*map(jnp.asarray, params))
    ms_s, Ps_s, ell_s = filtering(jnp.asarray(ys), lgssm, False)
    ms_p, Ps_p, ell_p = filtering(jnp.asarray(ys), lgssm, True)
    np.testing.assert_allclose(ms_s, ms_p, atol=1e-7, rtol=1e-6)
    np.testing.assert_allclose(Ps_s, Ps_p, atol=1e-7, rtol=1e-6)
    np.testing.assert_allclose(ell_s, ell_p, rtol=1e-7)


@pytest.mark.parametrize("T,dx,dy,nan_frac", [
    (9, 2, 2, 0.2), (16, 4, 3, 0.0), (12, 1, 1, 0.3)])
def test_make_target_logpdf_matches_sum(T, dx, dy, nan_frac):
    """The precomputed-factor closure must equal prior + log_likelihood
    (it exists because XLA won't hoist Cholesky custom calls out of while
    bodies; same math, factors computed once)."""
    from aux_ssm_tpu.ops.lgssm import make_target_logpdf

    params, ys = _make(5, T, dx, dy, nan_frac=nan_frac)
    lgssm = LGSSM(*map(jnp.asarray, params))
    ys = jnp.asarray(ys)
    xs = jnp.asarray(np.random.default_rng(1).standard_normal((T, dx)))
    want = log_likelihood(ys, xs, lgssm) + prior_logpdf(xs, lgssm)
    got = make_target_logpdf(ys, lgssm)(xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9)


def test_loglikelihood_and_prior_shapes():
    params, ys = _make(2, 9, 2, 2, nan_frac=0.2)
    lgssm = LGSSM(*map(jnp.asarray, params))
    xs = jnp.asarray(np.random.default_rng(0).standard_normal((9, 2)))
    ll = log_likelihood(jnp.asarray(ys), xs, lgssm)
    lp = prior_logpdf(xs, lgssm)
    assert np.isfinite(ll) and np.isfinite(lp)

    # Masked log-likelihood must equal the row-deleted computation.
    from scipy.stats import multivariate_normal
    want = 0.0
    ys_np = np.asarray(ys)
    for t in range(9):
        obs = np.isfinite(ys_np[t])
        if not obs.any():
            continue
        H, R, c = params[5][t], params[6][t], params[7][t]
        pred = H @ np.asarray(xs[t]) + c
        want += multivariate_normal.logpdf(
            ys_np[t][obs], pred[obs], R[np.ix_(obs, obs)]
        )
    np.testing.assert_allclose(ll, want, rtol=1e-8)


def test_jit_and_vmap_compose():
    params, ys = _make(4, 16, 2, 2)
    lgssm = LGSSM(*map(jnp.asarray, params))
    f = jax.jit(lambda y: filtering(y, lgssm, True)[2])
    ells = jax.vmap(f)(jnp.stack([jnp.asarray(ys)] * 4))
    assert ells.shape == (4,)
    np.testing.assert_allclose(ells, ells[0])
