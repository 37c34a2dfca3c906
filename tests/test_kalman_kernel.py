"""Invariance tests for the auxiliary Kalman kernel — a gap in the reference
test suite (SURVEY §4, "no tests for the auxiliary Kalman kernel itself").

On a linear-Gaussian target the first-order auxiliary proposal is exact:
p(x | u) ∝ prior(x) N(u; x, δ/2 I) g(x) is itself an LGSSM smoothing law, so
the MH acceptance probability must be exactly 1 and the chain's stationary
law is the exact Kalman smoother posterior."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aux_ssm_tpu.kernels.kalman import get_kernel
from aux_ssm_tpu.ops.lgssm import LGSSM, log_likelihood, prior_logpdf

from oracles import explicit_filter, explicit_smoother, random_lgssm, simulate


T, DX, DY = 6, 2, 2
DELTA = 0.7


@pytest.fixture(scope="module")
def target():
    rng = np.random.default_rng(12)
    params = random_lgssm(rng, T, DX, DY)
    ys = simulate(rng, *params)
    return tuple(map(jnp.asarray, params)), jnp.asarray(ys)


def _factories(params, ys):
    m0, P0, Fs, Qs, bs, Hs, Rs, cs = params
    eye = jnp.eye(DX)

    def dynamics_factory(x):
        return m0, P0, Fs, Qs, bs

    def observations_factory(x, u, delta):
        # Augment real observations with the auxiliary pseudo-observations
        # u ~ N(x, delta/2 I): exact for a Gaussian potential.
        ys_aug = jnp.concatenate([ys, u], axis=-1)
        Hs_aug = jnp.concatenate([Hs, jnp.tile(eye[None], (T, 1, 1))], axis=-2)
        zero = jnp.zeros((T, DY, DX))
        Rs_aug = jnp.concatenate(
            [
                jnp.concatenate([Rs, zero], axis=-1),
                jnp.concatenate([jnp.swapaxes(zero, -1, -2),
                                 0.5 * delta * jnp.tile(eye[None], (T, 1, 1))], axis=-1),
            ],
            axis=-2,
        )
        cs_aug = jnp.concatenate([cs, jnp.zeros((T, DX))], axis=-1)
        return ys_aug, Hs_aug, Rs_aug, cs_aug

    lgssm_obs = LGSSM(m0, P0, Fs, Qs, bs, Hs, Rs, cs)

    def log_likelihood_fn(x):
        # Full target: prior dynamics + Gaussian potential.
        return prior_logpdf(x, lgssm_obs) + log_likelihood(ys, x, lgssm_obs)

    return dynamics_factory, observations_factory, log_likelihood_fn


@pytest.mark.slow
@pytest.mark.parametrize("parallel", [False, True])
def test_exact_gaussian_target(target, parallel):
    params, ys = target
    init, kernel = get_kernel(*_factories(params, ys), parallel)
    state = init(jnp.zeros((T, DX)))

    n_iter = 20_000

    def body(carry, k):
        s = kernel(k, carry, DELTA)
        return s, (s.x, s.updated)

    keys = jax.random.split(jax.random.key(0), n_iter)
    _, (xs, accepted) = jax.lax.scan(body, state, keys)
    xs, accepted = np.asarray(xs), np.asarray(accepted)

    # Exact proposal => acceptance probability 1.
    assert accepted.mean() > 0.9999

    ms, Ps, _ = explicit_filter(np.asarray(ys), *map(np.asarray, params))
    msm, Psm = explicit_smoother(ms, Ps, *map(np.asarray, params[2:5]))
    std = np.sqrt(np.einsum("tii->ti", Psm))

    burn = n_iter // 4
    np.testing.assert_allclose(
        xs[burn:].mean(0), msm, atol=6 * std.max() / np.sqrt((n_iter - burn) / 10)
    )
    np.testing.assert_allclose(xs[burn:].std(0), std, rtol=0.1)


def test_log_target_cache_matches_recompute(target):
    """`KalmanSampler.log_target` caches log_likelihood_fn(x) across steps
    (kernels/kalman.py): reusing it in the reverse-move branch must give a
    chain bitwise-identical to recomputing from a hand-built state with
    log_target=None (the same expressions are evaluated either way)."""
    from aux_ssm_tpu.kernels.kalman import KalmanSampler

    params, ys = target
    init, kernel = get_kernel(*_factories(params, ys), parallel=False)

    x0 = jnp.zeros((T, DX))
    cached = init(x0)
    assert cached.log_target is not None
    uncached = KalmanSampler(x=x0, updated=jnp.asarray(True), log_target=None)

    def run(state, n=50):
        def body(carry, k):
            s = kernel(k, carry, DELTA)
            return s, (s.x, s.updated)

        keys = jax.random.split(jax.random.key(7), n)
        _, out = jax.lax.scan(body, state, keys)
        return out

    xs_c, acc_c = run(cached)
    xs_u, acc_u = run(uncached)
    np.testing.assert_array_equal(np.asarray(xs_c), np.asarray(xs_u))
    np.testing.assert_array_equal(np.asarray(acc_c), np.asarray(acc_u))
