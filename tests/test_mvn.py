import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import multivariate_normal

from aux_ssm_tpu.ops import mvn
from aux_ssm_tpu.ops.logspace import normalize, logsubexp, log1mexp


@pytest.mark.parametrize("seed", [0, 42])
@pytest.mark.parametrize("dim", [1, 3, 7])
def test_logpdf_vs_scipy(seed, dim):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(dim)
    m = rng.standard_normal(dim)
    A = rng.standard_normal((dim, dim))
    cov = A @ A.T + dim * np.eye(dim)
    chol = np.linalg.cholesky(cov)

    got = mvn.logpdf(jnp.asarray(x), jnp.asarray(m), jnp.asarray(chol))
    want = multivariate_normal.logpdf(x, m, cov)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_logpdf_batched():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((5, 3))
    m = rng.standard_normal((5, 3))
    chols = np.tril(rng.standard_normal((5, 3, 3))) + 3 * np.eye(3)
    got = mvn.logpdf(jnp.asarray(x), jnp.asarray(m), jnp.asarray(chols))
    for i in range(5):
        want = multivariate_normal.logpdf(x[i], m[i], chols[i] @ chols[i].T)
        np.testing.assert_allclose(got[i], want, rtol=1e-9)


def test_logpdf_infinite_variance_dims_drop_out():
    """Rows of chol with inf on the diagonal are ignored (load-bearing
    missing-data semantics, reference mvn/base.py:48-58)."""
    x = jnp.array([1.0, 2.0])
    m = jnp.array([0.0, 5.0])
    chol = jnp.array([[2.0, 0.0], [0.0, jnp.inf]])
    got = mvn.logpdf(x, m, chol)
    want = multivariate_normal.logpdf(1.0, 0.0, 4.0)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_rvs_moments():
    import jax
    key = jax.random.key(0)
    m = jnp.array([1.0, -2.0])
    chol = jnp.array([[2.0, 0.0], [1.0, 0.5]])
    keys = jax.random.split(key, 200_000)
    draws = jax.vmap(lambda k: mvn.rvs(k, m, chol))(keys)
    np.testing.assert_allclose(draws.mean(0), m, atol=2e-2)
    np.testing.assert_allclose(np.cov(np.asarray(draws).T), chol @ chol.T, atol=5e-2)


def test_tril_log_det():
    chol = jnp.array([[2.0, 0.0], [1.0, 3.0]])
    np.testing.assert_allclose(mvn.tril_log_det(chol), np.log(6.0), rtol=1e-12)
    chol_inf = jnp.array([[2.0, 0.0], [1.0, jnp.inf]])
    np.testing.assert_allclose(mvn.tril_log_det(chol_inf), np.log(2.0), rtol=1e-12)


def test_optimal_covariance_dominates():
    rng = np.random.default_rng(3)
    A = rng.standard_normal((3, 3))
    B = rng.standard_normal((3, 3))
    P = A @ A.T + np.eye(3)
    Sig = B @ B.T + np.eye(3)
    chol_Q = mvn.get_optimal_covariance(
        jnp.linalg.cholesky(jnp.asarray(P)), jnp.linalg.cholesky(jnp.asarray(Sig))
    )
    Q = np.asarray(chol_Q @ chol_Q.T)
    for M in (P, Sig):
        w = np.linalg.eigvalsh(Q - M)
        assert w.min() > -1e-8


def test_normalize():
    lw = jnp.log(jnp.array([1.0, 2.0, 3.0]))
    w = normalize(lw)
    np.testing.assert_allclose(w, [1 / 6, 2 / 6, 3 / 6], rtol=1e-12)
    # axis-wise
    lw2 = jnp.stack([lw, lw + 5.0])
    w2 = normalize(lw2, axis=1)
    np.testing.assert_allclose(w2.sum(1), [1.0, 1.0], rtol=1e-12)


def test_logspace_identities():
    np.testing.assert_allclose(logsubexp(jnp.log(5.0), jnp.log(3.0)), np.log(2.0), rtol=1e-10)
    x = jnp.array([-1e-3, -1.0, -30.0])
    np.testing.assert_allclose(log1mexp(x), np.log1p(-np.exp(np.asarray(x))), rtol=1e-9)


def test_ess_ar1_theory():
    """ESS of an AR(1) chain must track n (1-rho)/(1+rho)."""
    import jax
    from aux_ssm_tpu.utils.ess import effective_sample_size
    rho, n = 0.8, 200_000
    key = jax.random.key(0)
    eps = np.asarray(jax.random.normal(key, (n,)))
    x = np.zeros(n)
    for t in range(1, n):
        x[t] = rho * x[t - 1] + eps[t]
    got = float(effective_sample_size(x))
    want = n * (1 - rho) / (1 + rho)
    assert abs(got - want) / want < 0.15, (got, want)

    # known-variance mode
    got_kv = float(effective_sample_size(x, known_variance=1.0 / (1 - rho ** 2)))
    assert abs(got_kv - want) / want < 0.15, (got_kv, want)
