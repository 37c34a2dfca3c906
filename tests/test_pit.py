"""Parallel-in-time cSMC: dc_map semantics and kernel invariance vs the
exact smoothing law (assertion-based)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aux_ssm_tpu.kernels.pit import dc_map, get_kernel
from aux_ssm_tpu.kernels.csmc_independent import DiagonalGaussian

from csmc_common import GaussianM0, GaussianObsGt, ar1_lgssm_arrays
from oracles import explicit_filter, explicit_smoother


# ---- dc_map --------------------------------------------------------------

def _sum_operator(a, b):
    """Toy associative operator: running total concatenation. Leaves have
    shape (n_pairs, block)."""
    a_last = a[:, -1:]
    return jnp.concatenate([a, b + a_last], axis=1)


@pytest.mark.parametrize("T", [1, 2, 3, 5, 8, 13, 16])
def test_dc_map_prefix_sum(T):
    x = jnp.arange(1.0, T + 1)
    out = dc_map(x, _sum_operator)
    np.testing.assert_allclose(np.asarray(out), np.cumsum(np.arange(1.0, T + 1)))


def test_dc_map_pytree_and_keys():
    T = 6
    elems = {
        "v": jnp.arange(1.0, T + 1),
        "i": jnp.arange(T, dtype=jnp.int32),
        "k": jax.random.split(jax.random.key(0), T),
    }

    def op(a, b):
        return {
            "v": jnp.concatenate([a["v"], b["v"] + a["v"][:, -1:]], axis=1),
            "i": jnp.concatenate([a["i"], b["i"]], axis=1),
            "k": jnp.concatenate([a["k"], b["k"]], axis=1),
        }

    out = dc_map(elems, op)
    np.testing.assert_allclose(np.asarray(out["v"]), np.cumsum(np.arange(1.0, T + 1)))
    np.testing.assert_array_equal(np.asarray(out["i"]), np.arange(T))
    assert out["k"].shape == (T,)


# ---- PIT kernel invariance ----------------------------------------------

T, D = 6, 1
PHI, SIG_X, SIG_Y = 0.9, 0.5, 0.4
N_PART = 64


@pytest.mark.slow
@pytest.mark.parametrize("with_qt,fused,blocked",
                         [(False, False, False), (True, False, False),
                          (False, True, False), (True, True, False),
                          (False, True, True)])
def test_pit_csmc_invariance(with_qt, fused, blocked, monkeypatch):
    """PIT-cSMC with independent N(u_t, delta/2) proposals must keep the
    auxiliary target invariant; we check the full auxiliary Gibbs chain
    (u-refresh + PIT kernel) recovers the LGSSM smoothing posterior.
    `fused=True` marks the observation potential previous-state-independent,
    which routes stitching through the factorised (matmul) operator;
    `blocked=True` additionally forces the single-pass block-mass draw
    (requires N % 128 == 0)."""
    n_part = 128 if blocked else N_PART
    monkeypatch.setenv("AUX_SSM_STITCH", "blocked" if blocked else "2pass")
    rng = np.random.default_rng(0)
    ys = rng.standard_normal((T, D)) * 0.5
    delta = 0.8

    # The model: AR(1) prior + Gaussian obs potential (all through Gt; the
    # prior transition density is part of Gt as in the auxiliary paradigm).
    from aux_ssm_tpu.kernels.csmc_independent import get_kernel as get_indep
    from csmc_common import ARDynamics, GaussianM0

    import chex
    from jax.scipy.stats import norm
    from aux_ssm_tpu.kernels.csmc_base import UnivariatePotential, Potential

    @chex.dataclass
    class ObsG0(UnivariatePotential):
        def __call__(self, x):
            return jnp.sum(norm.logpdf(jnp.asarray(ys[0]), x, SIG_Y), axis=-1)

    @chex.dataclass
    class ObsGt(Potential):
        prev_dependent = not fused

        def __call__(self, x_next, x_t, y):
            return jnp.sum(norm.logpdf(y, x_next, SIG_Y), axis=-1)

    M0 = GaussianM0(m0=jnp.zeros(D), sig0=jnp.ones(D))
    Mt = ARDynamics(params=(jnp.full((T - 1, D), PHI), jnp.full((T - 1, D), SIG_X)))
    G0 = ObsG0()
    Gt = ObsGt(params=jnp.asarray(ys[1:]))

    init, kernel = get_indep(M0, G0, Mt, Gt, n_part, gradient=with_qt, parallel=True)
    state = init(jnp.zeros((T, D)))

    n_iter = 30_000

    def body(st, k):
        st = kernel(k, st, delta)
        return st, (st.x, st.updated)

    keys = jax.random.split(jax.random.key(0), n_iter)
    _, (xs, upd) = jax.lax.scan(jax.jit(body), state, keys)
    xs = np.asarray(xs)[n_iter // 4:]

    assert float(np.asarray(upd).mean()) > 0.2

    params = ar1_lgssm_arrays(T, D, PHI, SIG_X, SIG_Y)
    ms, Ps, _ = explicit_filter(ys, *params)
    msm, Psm = explicit_smoother(ms, Ps, params[2], params[3], params[4])
    std = np.sqrt(np.einsum("tii->ti", Psm))

    np.testing.assert_allclose(xs.mean(0), msm, atol=6 * std.max() / np.sqrt(len(xs) / 30))
    np.testing.assert_allclose(xs.std(0), std, rtol=0.15)


@pytest.mark.parametrize("T_odd", [3, 5])
def test_pit_odd_T_tail_importance_weights(T_odd):
    """Regression: with odd T the last step never serves as a level-0
    boundary — its initial importance weights must still enter at the first
    level where it joins the tree. With flat potentials and Qt given, the
    kernel's invariant law is the independent Qt marginals: the chain mean
    at EVERY step (including t = T-1) must move to Qt's location."""
    import chex
    from jax.scipy.stats import norm
    from aux_ssm_tpu.kernels.csmc_base import UnivariatePotential, Potential

    loc = np.zeros((T_odd, 1))
    loc[0, 0], loc[-1, 0] = 2.0, 3.0
    Mt = DiagonalGaussian(loc=jnp.zeros((T_odd, 1)), scale=jnp.ones(T_odd))
    Qt = DiagonalGaussian(loc=jnp.asarray(loc), scale=jnp.ones(T_odd))

    @chex.dataclass
    class G0(UnivariatePotential):
        def __call__(self, x):
            return jnp.zeros(x.shape[:-1])

    @chex.dataclass
    class Gt(Potential):
        def __call__(self, x_next, x_t, _):
            return jnp.zeros(x_next.shape[:-1])

    init, kernel = get_kernel(Mt, G0(), Gt(params=jnp.zeros((T_odd - 1, 1))),
                              64, Qt=Qt)
    st = init(jnp.zeros((T_odd, 1)))

    def body(s, k):
        s = kernel(k, s)
        return s, s.x[:, 0]

    keys = jax.random.split(jax.random.key(2), 1500)
    _, xs = jax.jit(lambda s, k: jax.lax.scan(body, s, k))(st, keys)
    xs = np.asarray(xs)[300:]
    se = 1.0 / np.sqrt(len(xs) / 10)          # ESS-aware MC error
    np.testing.assert_allclose(xs.mean(0), loc[:, 0], atol=6 * se)


def test_pit_kernel_runs_non_pow2():
    """T not a power of two exercises the passthrough path."""
    T_odd = 5
    u = jnp.asarray(np.random.default_rng(1).standard_normal((T_odd, D)))
    scale = jnp.full((T_odd,), 0.6)
    Mt = DiagonalGaussian(loc=u, scale=scale)

    import chex
    from aux_ssm_tpu.kernels.csmc_base import UnivariatePotential, Potential
    from jax.scipy.stats import norm

    @chex.dataclass
    class G0(UnivariatePotential):
        def __call__(self, x):
            return jnp.sum(norm.logpdf(x), -1)

    @chex.dataclass
    class Gt(Potential):
        def __call__(self, x_next, x_t, _):
            return jnp.sum(norm.logpdf(x_next, 0.9 * x_t, 0.5), -1)

    init, kernel = get_kernel(Mt, G0(), Gt(params=jnp.zeros((T_odd - 1, 1))), 16)
    st = init(jnp.zeros((T_odd, D)))
    out = jax.jit(kernel)(jax.random.key(0), st)
    assert out.x.shape == (T_odd, D)
    assert np.isfinite(np.asarray(out.x)).all()
