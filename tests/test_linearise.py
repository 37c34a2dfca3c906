"""Linearisation rules: exact on affine models, pairwise-consistent, and
sane on a nonlinear model (contract from reference test_linearisation.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aux_ssm_tpu.ops.linearise import extended, cubature, gauss_hermite

RULES = [extended, cubature, gauss_hermite]


@pytest.fixture
def affine():
    rng = np.random.default_rng(0)
    F = jnp.asarray(rng.standard_normal((3, 3)))
    b = jnp.asarray(rng.standard_normal(3))
    Q = jnp.asarray(np.diag(rng.uniform(0.5, 2.0, 3)))

    def mean(x, _p):
        return F @ x + b

    def cov(x, _p):
        return Q

    return F, b, Q, mean, cov


@pytest.mark.parametrize("rule", RULES)
def test_exact_on_affine(affine, rule):
    F, b, Q, mean, cov = affine
    x_star = jnp.asarray(np.random.default_rng(1).standard_normal(3))
    P_star = jnp.eye(3)
    F_hat, Q_hat, b_hat = rule(mean, cov, None, x_star, P_star)
    np.testing.assert_allclose(F_hat, F, atol=1e-8)
    np.testing.assert_allclose(Q_hat, Q, atol=1e-8)
    np.testing.assert_allclose(b_hat, b, atol=1e-8)


def test_sigma_rules_agree_nonlinear():
    def mean(x, _p):
        return jnp.sin(x)

    def cov(x, _p):
        return 0.1 * jnp.eye(2)

    x_star = jnp.array([0.3, -0.2])
    P_star = 0.05 * jnp.eye(2)
    Fc, Qc, bc = cubature(mean, cov, None, x_star, P_star)
    Fg, Qg, bg = gauss_hermite(mean, cov, None, x_star, P_star)
    Fe, Qe, be = extended(mean, cov, None, x_star, P_star)
    # Small P*: statistical linearisations approach the Taylor one.
    np.testing.assert_allclose(Fc, Fe, atol=5e-2)
    np.testing.assert_allclose(Fg, Fe, atol=5e-2)
    np.testing.assert_allclose(Fc, Fg, atol=2e-2)
    assert np.all(np.linalg.eigvalsh(np.asarray(Qc)) > 0)


def test_extended_uses_params():
    def mean(x, p):
        return p * x

    def cov(x, p):
        return jnp.eye(2)

    F, Q, b = extended(mean, cov, 3.0, jnp.ones(2), None)
    np.testing.assert_allclose(F, 3.0 * np.eye(2), atol=1e-12)
    np.testing.assert_allclose(b, 0.0, atol=1e-12)


def test_vmap_over_trajectory():
    """The lorenz pattern: vmap(extended) over per-step linearisation points."""
    def mean(x, p):
        return x + 0.01 * jnp.array([10 * (x[1] - x[0]), x[0] * (28 - x[2]) - x[1],
                                     x[0] * x[1] - 8 / 3 * x[2]])

    def cov(x, p):
        return 0.1 * jnp.eye(3)

    xs = jnp.asarray(np.random.default_rng(2).standard_normal((7, 3)))
    Fs, Qs, bs = jax.vmap(lambda x: extended(mean, cov, None, x, None))(xs)
    assert Fs.shape == (7, 3, 3) and Qs.shape == (7, 3, 3) and bs.shape == (7, 3)
    # F x* + b must reproduce the mean at the expansion point.
    np.testing.assert_allclose(
        jnp.einsum("tij,tj->ti", Fs, xs) + bs, jax.vmap(lambda x: mean(x, None))(xs),
        atol=1e-8,
    )
