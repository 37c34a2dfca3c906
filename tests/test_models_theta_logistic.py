"""Theta-logistic model + PGAS ancestor sampling. Invariance of the
ancestor-sampling kernel is checked on the linear-Gaussian toy (exact
oracle); the theta-logistic gets agreement-between-variants checks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aux_ssm_tpu.kernels.csmc import get_kernel
from aux_ssm_tpu.models import theta_logistic as tl

from csmc_common import GaussianM0, ARDynamics, FlatG0, GaussianObsGt, ar1_lgssm_arrays
from oracles import explicit_filter, explicit_smoother


@pytest.mark.slow
def test_ancestor_sampling_invariance_lgssm():
    T, D = 5, 1
    PHI, SIG_X, SIG_Y = 0.9, 0.5, 0.4
    rng = np.random.default_rng(0)
    ys = rng.standard_normal((T, D)) * 0.5

    M0 = GaussianM0(m0=jnp.zeros(D), sig0=jnp.ones(D))
    Mt = ARDynamics(params=(jnp.full((T - 1, D), PHI), jnp.full((T - 1, D), SIG_X)))
    Gt = GaussianObsGt(params=(jnp.asarray(ys[1:]), jnp.full((T - 1, D), SIG_Y)))
    init, kernel = get_kernel(M0, FlatG0(), Mt, Gt, 16, ancestor_sampling=True)
    state = init(jnp.zeros((T, D)))

    n_iter = 30_000

    def body(st, k):
        st = kernel(k, st)
        return st, (st.x, st.updated)

    _, (xs, upd) = jax.lax.scan(jax.jit(body), state,
                                jax.random.split(jax.random.key(0), n_iter))
    xs = np.asarray(xs)[n_iter // 4:]

    ys_o = ys.copy(); ys_o[0] = np.nan
    params = ar1_lgssm_arrays(T, D, PHI, SIG_X, SIG_Y)
    ms, Ps, _ = explicit_filter(ys_o, *params)
    msm, Psm = explicit_smoother(ms, Ps, params[2], params[3], params[4])
    std = np.sqrt(np.einsum("tii->ti", Psm))

    # PGAS should mix markedly better than plain cSMC at small N.
    assert np.asarray(upd).mean() > 0.6
    np.testing.assert_allclose(xs.mean(0), msm, atol=6 * std.max() / np.sqrt(len(xs) / 20))
    np.testing.assert_allclose(xs.std(0), std, rtol=0.1)


@pytest.fixture(scope="module")
def data():
    xs, ys = tl.get_data(jax.random.key(0), 40)
    return xs, ys


def test_data_shapes(data):
    xs, ys = data
    assert xs.shape == (40, 1) and ys.shape == (40, 1)
    assert np.isfinite(np.asarray(xs)).all()


@pytest.mark.parametrize("anc", [False, True])
def test_pgas_runs_and_mixes(data, anc):
    _, ys = data
    init, kernel = tl.get_pgas_kernel(ys, 64, ancestor_sampling=anc)
    state = init(jnp.zeros_like(ys))

    def body(st, k):
        st = kernel(k, st)
        return st, st.updated

    state, upd = jax.lax.scan(jax.jit(body), state,
                              jax.random.split(jax.random.key(1), 300))
    rate = np.asarray(upd).mean()
    assert np.isfinite(np.asarray(state.x)).all()
    # Plain cSMC path-degenerates at T=40 (low but nonzero update rate);
    # ancestor sampling must mix substantially better — the point of PGAS.
    assert rate > (0.5 if anc else 0.05), rate


@pytest.mark.slow
def test_pgas_agrees_with_backward_sampling(data):
    """Two different valid kernels must produce the same posterior."""
    _, ys = data

    def run(kernel, init, seed, n):
        def body(st, k):
            st = kernel(k, st)
            return st, st.x
        _, xs = jax.lax.scan(jax.jit(body), init(jnp.zeros_like(ys)),
                             jax.random.split(jax.random.key(seed), n))
        return np.asarray(xs)[n // 4:]

    n = 12_000
    init_a, kern_a = tl.get_pgas_kernel(ys, 64, ancestor_sampling=True)
    init_b, kern_b = tl.get_pgas_kernel(ys, 64, ancestor_sampling=False, backward=True)
    xs_a = run(kern_a, init_a, 2, n)
    xs_b = run(kern_b, init_b, 3, n)

    diff_mean = np.abs(xs_a.mean(0) - xs_b.mean(0))
    assert diff_mean.max() < 0.08, diff_mean.max()
    diff_std = np.abs(xs_a.std(0) - xs_b.std(0))
    assert diff_std.max() < 0.05, diff_std.max()
