"""Lorenz model: NaN-padded observation grid through the masked Kalman
machinery, conjugate theta posterior, and the Gibbs parameter-learning loop."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aux_ssm_tpu.models import lorenz

THETA_TRUE = jnp.array([10.0, 28.0, 8.0 / 3.0])
SIGMA_X, SIG_Y, DT = 3.0, 0.5, 0.02
N_STEPS, EVERY = 64, 4


@pytest.fixture(scope="module")
def synthetic():
    m0 = jnp.array([1.5, -1.5, 25.0])
    P0 = jnp.eye(3)
    xs = lorenz.sample_trajectory(jax.random.key(0), m0, P0, THETA_TRUE,
                                  SIGMA_X, DT, N_STEPS)
    obs_idx = np.arange(0, N_STEPS, EVERY)
    ys_obs = np.asarray(xs)[obs_idx, 1:] + SIG_Y * np.random.default_rng(0).standard_normal(
        (len(obs_idx), 2))
    data = np.column_stack([obs_idx * DT, ys_obs])
    ys, Hs, Rs, cs = lorenz.observations_model(data, SIG_Y, N_STEPS, EVERY)
    return m0, P0, xs, tuple(map(jnp.asarray, (ys, Hs, Rs, cs)))


def test_observation_grid(synthetic):
    _, _, _, (ys, Hs, Rs, cs) = synthetic
    ys, Hs = np.asarray(ys), np.asarray(Hs)
    assert np.isfinite(ys[::EVERY]).all()
    mask = np.ones(N_STEPS, bool); mask[::EVERY] = False
    assert np.isnan(ys[mask]).all() and np.isnan(Hs[mask]).all()


def test_mider_dataset_ships_and_aligns():
    """The packaged Mider et al. dataset loads and the reference freq
    semantics (dt = freq * 1e-4) produce a consistent NaN-padded grid for
    every reference frequency, including the non-uniform freq=8 case."""
    from aux_ssm_tpu.experiments.lorenz import MIDER_DATA

    data = np.loadtxt(MIDER_DATA, delimiter=",", skiprows=1)
    assert data.shape == (201, 3)
    np.testing.assert_allclose(data[:, 0], np.arange(201) * 0.01, atol=1e-12)

    for freq in (1, 2, 4, 8):
        dt = freq * 1e-4
        n_steps = int(round(data[-1, 0] / dt)) + 1
        obs_idx = np.rint(data[:, 0] / dt).astype(np.int64)
        assert len(np.unique(obs_idx)) == 201     # no collisions
        ys, Hs, Rs, cs = lorenz.observations_model(data, 5.0 ** 0.5, n_steps,
                                                   obs_idx=obs_idx)
        assert ys.shape == (n_steps, 2)
        assert np.isfinite(ys[obs_idx]).all()
        mask = np.ones(n_steps, bool)
        mask[obs_idx] = False
        assert np.isnan(ys[mask]).all() and np.isnan(Hs[mask]).all()


def test_theta_posterior_is_conjugate(synthetic):
    """Flat-ish prior: the posterior mean must approach the ridge/OLS
    solution of the per-step regression."""
    _, _, xs, _ = synthetic
    mean, chol = lorenz.theta_posterior_mean_and_chol(xs, 1e6, DT, SIGMA_X)
    X = DT * np.asarray(jax.vmap(lorenz.phi)(xs[:-1]))
    Y = np.asarray(xs[1:] - xs[:-1]) - DT * np.asarray(jax.vmap(lorenz.phi_0)(xs[:-1]))
    ols = (X * Y).sum(0) / (X * X).sum(0)
    np.testing.assert_allclose(np.asarray(mean), ols, rtol=1e-4)
    assert (np.asarray(chol) > 0).all()
    # theta posterior should be near the truth on this trajectory
    np.testing.assert_allclose(np.asarray(mean), np.asarray(THETA_TRUE),
                               atol=6 * np.asarray(chol).max() + 0.5)


@pytest.mark.parametrize("parallel", [False, True])
def test_kalman_kernel_moves(synthetic, parallel):
    m0, P0, xs, (ys, Hs, Rs, cs) = synthetic
    init, kernel = lorenz.get_kalman_kernel(ys, Hs, Rs, cs, m0, P0, THETA_TRUE,
                                            SIGMA_X, DT, parallel)
    state = init(xs)

    def body(st, k):
        st = kernel(k, st, 1e-2)
        return st, st.updated

    state, upd = jax.lax.scan(jax.jit(body), state,
                              jax.random.split(jax.random.key(1), 100))
    assert np.isfinite(np.asarray(state.x)).all()
    assert np.asarray(upd).mean() > 0.05


@pytest.mark.slow
def test_gibbs_recovers_theta(synthetic):
    m0, P0, xs, (ys, Hs, Rs, cs) = synthetic
    init, kernel = lorenz.get_gibbs_kernel(ys, Hs, Rs, cs, m0, P0, SIGMA_X, DT,
                                           sigma_theta=100.0, parallel=True)
    state = init(xs, jnp.zeros(3))

    def body(st, k):
        st = kernel(k, st, 5e-3)
        return st, st.theta

    _, thetas = jax.lax.scan(jax.jit(body), state,
                             jax.random.split(jax.random.key(2), 600))
    thetas = np.asarray(thetas)[200:]
    assert np.isfinite(thetas).all()
    # Loose recovery: posterior concentrates near the truth given the data.
    err = np.abs(thetas.mean(0) - np.asarray(THETA_TRUE))
    assert (err < np.array([6.0, 8.0, 2.0])).all(), err
