"""Spatial model: native precision builder, stencil-vs-matrix equivalence,
t-distribution vs scipy, and sampler smoke tests in the batched layout."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import multivariate_t as scipy_t

from aux_ssm_tpu.native.precision import (
    make_precision_coo, make_precision_dense, precision_stencil, have_native,
    _coo_numpy,
)
from aux_ssm_tpu.models import t_distribution as tdist
from aux_ssm_tpu.models import spatial

TAU, R_Y, D, NU, SIG_X = -0.25, 1.0, 3, 4.0, 0.5


def test_native_matches_numpy_fallback():
    data_n, rows_n, cols_n = _coo_numpy(TAU, R_Y, 5)
    data, rows, cols = make_precision_coo(TAU, R_Y, 5)
    dense_a = np.zeros((25, 25)); dense_a[rows_n, cols_n] = data_n
    dense_b = np.zeros((25, 25)); dense_b[rows, cols] = data
    np.testing.assert_allclose(dense_a, dense_b)
    # The reference doctest case (model.py:41-46).
    got = make_precision_dense(-0.25, 1, 2)
    want = np.array([
        [1.0, -0.25, -0.25, 0.0],
        [-0.25, 1.0, 0.0, -0.25],
        [-0.25, 0.0, 1.0, -0.25],
        [0.0, -0.25, -0.25, 1.0],
    ])
    np.testing.assert_allclose(got, want)


def test_native_library_builds():
    # The C++ path should be available in this environment (g++ baked in).
    assert have_native()


def test_stencil_equals_matrix_apply():
    prec = make_precision_dense(TAU, R_Y, D)
    stencil = precision_stencil(TAU, R_Y)
    rng = np.random.default_rng(0)
    v = rng.standard_normal((7, D * D))
    want = v @ prec.T
    got = tdist.apply_precision_stencil(jnp.asarray(v), jnp.asarray(stencil), D)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-10)


def test_t_logpdf_vs_scipy():
    prec = make_precision_dense(TAU, R_Y, D)
    stencil = precision_stencil(TAU, R_Y)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((10, D * D))
    mu = rng.standard_normal(D * D)
    got = np.asarray(tdist.logpdf(jnp.asarray(x), jnp.asarray(mu), NU,
                                  stencil=jnp.asarray(stencil), d=D))
    want = scipy_t.logpdf(x, loc=mu, df=NU, shape=np.linalg.inv(prec))
    # Unnormalised: constant offset, zero spread.
    ratio = got - want
    np.testing.assert_allclose(ratio, ratio.mean(), atol=1e-8)


def test_t_sample_moments():
    prec = make_precision_dense(TAU, R_Y, 2)
    chol_prec = np.linalg.cholesky(prec).T  # upper
    mu = jnp.asarray(np.arange(4.0))
    keys = jax.random.split(jax.random.key(0), 100_000)
    draws = np.asarray(tdist.sample(keys, mu, 5.0, jnp.asarray(chol_prec)))
    np.testing.assert_allclose(draws.mean(0), mu, atol=0.05)
    want_cov = 5.0 / 3.0 * np.linalg.inv(prec)
    np.testing.assert_allclose(np.cov(draws.T), want_cov, atol=0.1)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(2)
    T = 12
    xs, ys = spatial.get_data(rng, SIG_X, R_Y, TAU, NU, D, T)
    return jnp.asarray(xs), jnp.asarray(ys)


@pytest.mark.parametrize("order", [1, 2])
def test_kalman_batched_runs(data, order):
    xs, ys = data
    init, kernel = spatial.get_kalman_kernel(ys, SIG_X, NU, TAU, R_Y, D,
                                             parallel=True, order=order)
    state = init(xs)
    assert state.x.shape == (12, D * D, 1)
    out = jax.jit(lambda k, s: kernel(k, s, 0.1))(jax.random.key(0), state)
    assert np.isfinite(np.asarray(out.x)).all()

    # A few adapted steps must move the chain.
    def body(st, k):
        st = kernel(k, st, 0.1)
        return st, st.updated

    _, upd = jax.lax.scan(body, state, jax.random.split(jax.random.key(1), 50))
    assert np.asarray(upd).mean() > 0.05


@pytest.mark.parametrize("style", ["csmc", "guided"])
def test_csmc_styles_run(data, style):
    xs, ys = data
    stencil = precision_stencil(TAU, R_Y)
    x0 = spatial.init_x_fn(jax.random.key(2), ys, SIG_X, NU, jnp.asarray(stencil), D, 32)
    T = ys.shape[0]
    if style == "csmc":
        init, kernel = spatial.get_csmc_kernel(ys, SIG_X, NU, TAU, R_Y, D, 16, backward=True)
    else:
        init, kernel = spatial.get_guided_csmc_kernel(ys, SIG_X, NU, TAU, R_Y, D, 16,
                                                      backward=True)
    state = init(x0)

    def body(st, k):
        st = kernel(k, st, jnp.full((T,), 0.3))
        return st, st.updated

    _, upd = jax.lax.scan(jax.jit(body), state, jax.random.split(jax.random.key(3), 100))
    assert np.asarray(upd).mean() > 0.05
