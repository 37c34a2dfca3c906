"""Stochastic Lorenz-63 model with partial observations and conjugate
parameter learning.

Capability parity with `examples/lorenz/` (model.py, auxiliary_kalman.py,
Gibbs structure in experiment.py:95-117) — independent implementation.

Model: Euler–Maruyama discretisation of
    dX = (phi_0(X) + theta .* phi(X)) dt + sigma_x dW,   X in R^3
with theta = (s, r-ish, b) entering *linearly* — hence a conjugate Gaussian
update for theta given a trajectory (Bayesian linear regression).
Observations: components (x2, x3) seen every `sample_every` steps through
N(., sig_y^2 I); the observation grid is NaN-padded in both ys and Hs, which
the masked Kalman machinery handles exactly.

The proposal LGSSM linearises the nonlinear drift at the current trajectory
with `vmap(extended)` per step; auxiliary u-rows are concatenated with the
real observation rows into one augmented observation model.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import block_diag

from ..kernels.kalman import get_kernel as get_kalman_generic
from ..ops import mvn
from ..ops.linearise import extended


def phi_0(x):
    x1, x2, x3 = x
    return jnp.array([0.0, -x2 - x1 * x3, x1 * x2])


def phi(x):
    x1, x2, x3 = x
    return jnp.array([x2 - x1, x1, -x3])


def get_dynamics(theta, sigma_x, dt):
    """Conditional mean callable and (constant) innovation covariance."""
    def mean(x, _params):
        return x + dt * (phi_0(x) + theta * phi(x))

    Q = dt * sigma_x ** 2 * jnp.eye(3)
    return mean, Q


def sample_trajectory(key, m0, P0, theta, sigma_x, dt, n_steps):
    mean, _ = get_dynamics(theta, sigma_x, dt)

    def body(x, k):
        x = mean(x, None) + sigma_x * jnp.sqrt(dt) * jax.random.normal(k, x.shape)
        return x, x

    init_key, scan_key = jax.random.split(key)
    x0 = jax.random.multivariate_normal(init_key, mean=m0, cov=P0)
    _, xs = jax.lax.scan(body, x0, jax.random.split(scan_key, n_steps - 1))
    return jnp.concatenate([x0[None], xs], axis=0)


def observations_model(data, sig_y, n_steps, sample_every=None, obs_idx=None):
    """NaN-padded observation grid: rows of ys/Hs are NaN except at the
    observation steps — every `sample_every` steps, or an explicit `obs_idx`
    index array (one entry per data row) for observation times that do not
    land on a uniform sub-grid (e.g. the Mider dataset at freq=8, where
    0.01/dt = 12.5)."""
    ys = data[:, 1:]
    if obs_idx is None:
        obs_idx = np.arange(len(ys)) * sample_every
    obs_idx = np.asarray(obs_idx, dtype=np.int64)
    if len(obs_idx) != len(ys) or obs_idx[-1] >= n_steps:
        raise ValueError(f"observation indices ({len(obs_idx)} entries, max "
                         f"{obs_idx[-1]}) do not fit {len(ys)} data rows on "
                         f"a {n_steps}-step grid")
    ys_ext = np.full((n_steps, 2), np.nan)
    ys_ext[obs_idx] = ys

    H = np.array([[0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    Hs = np.full((n_steps, 2, 3), np.nan)
    Hs[obs_idx] = H

    Rs = np.tile(sig_y ** 2 * np.eye(2)[None], (n_steps, 1, 1))
    cs = np.zeros_like(ys_ext)
    return ys_ext, Hs, Rs, cs


def theta_posterior_mean_and_chol(x, sigma_theta, dt, sigma_x):
    """Conjugate posterior over theta given a trajectory: the drift is linear
    in theta, so this is a (diagonal) Bayesian linear regression."""
    phis = jax.vmap(phi)(x[:-1])
    phis_0 = jax.vmap(phi_0)(x[:-1])
    Y = (x[1:] - x[:-1]) - dt * phis_0
    X = dt * phis
    sigma_Y = sigma_x * jnp.sqrt(dt)

    Sigma_inv = jnp.einsum("ij,ij->j", X, X) + 1.0 / sigma_theta ** 2
    Sigma = 1.0 / Sigma_inv
    mean = Sigma * jnp.einsum("ij,ij->j", X, Y)
    chol = sigma_Y * jnp.sqrt(Sigma)
    return mean, chol


def init_x_fn(data, n_steps):
    """Interpolated initial trajectory from the observed components."""
    T = data[-1, 0]
    ts = jnp.linspace(0.0, T, n_steps)
    xs = jnp.ones((n_steps, 3))
    xs = xs.at[:, 0].set(25.0)
    xs = xs.at[:, 1].set(jnp.interp(ts, data[:, 0], data[:, -2]))
    xs = xs.at[:, 2].set(jnp.interp(ts, data[:, 0], data[:, -1]))
    return xs


def target_whiteners(m0, P0, Rs, sigma_x, dt):
    """Theta-INDEPENDENT factorisations of the target density, computed once
    eagerly. The Gibbs step rebuilds the Kalman kernel inside the traced
    body (theta changes every step), and XLA never hoists Cholesky custom
    calls out of while bodies — without this the constant chol(P0)/chol(Q)/
    batched chol(Rs) refactorise every Gibbs iteration."""
    from jax.scipy.linalg import solve_triangular

    Q = dt * sigma_x ** 2 * jnp.eye(3)
    chol_P0 = jnp.linalg.cholesky(P0)
    chol_Q = jnp.linalg.cholesky(Q)
    chol_Rs = jnp.linalg.cholesky(Rs)
    eye_y = jnp.broadcast_to(jnp.eye(Rs.shape[-1], dtype=Rs.dtype),
                             chol_Rs.shape)
    return {
        "chol_P0": chol_P0, "chol_Q": chol_Q,
        "inv_chol_Rs": solve_triangular(chol_Rs, eye_y, lower=True),
        "logdet_Rs": jnp.sum(jnp.log(jnp.diagonal(chol_Rs, axis1=-2,
                                                  axis2=-1)), axis=-1),
    }


def get_kalman_kernel(ys, Hs, Rs, cs, m0, P0, theta, sigma_x, dt, parallel,
                      whiteners=None):
    """Auxiliary Kalman kernel with per-step extended linearisation of the
    nonlinear drift and u-rows concatenated with the real observations.

    Pass `whiteners` (from `target_whiteners`, computed OUTSIDE any jit/
    scan) when constructing the kernel inside a traced Gibbs body so the
    constant target factorisations stay out of the loop."""
    import math as _math
    T = ys.shape[0]
    eye = jnp.eye(3)
    eyes = jnp.tile(eye[None], (T, 1, 1))

    mean, Q = get_dynamics(theta, sigma_x, dt)
    cov = lambda _x, _p: Q
    if whiteners is None:
        whiteners = target_whiteners(m0, P0, Rs, sigma_x, dt)
    chol_P0 = whiteners["chol_P0"]
    chol_Q = whiteners["chol_Q"]
    inv_chol_Rs = whiteners["inv_chol_Rs"]
    logdet_Rs = whiteners["logdet_Rs"]
    dy = Rs.shape[-1]

    def dynamics_factory(x):
        Fs, Qs, bs = jax.vmap(lambda z: extended(mean, cov, None, z, None))(x[:-1])
        return m0, P0, Fs, Qs, bs

    def observations_factory(_x, u, delta):
        aux_ys = jnp.concatenate([u, ys], axis=1)
        aux_Hs = jnp.concatenate([eyes, Hs], axis=1)
        aux_cs = jnp.concatenate([jnp.zeros_like(u), cs], axis=1)
        aux_Rs = jax.vmap(block_diag)(0.5 * delta * eyes, Rs)
        return aux_ys, aux_Hs, aux_Rs, aux_cs

    def log_likelihood_fn(x):
        pred_x = jax.vmap(mean, in_axes=(0, None))(x[:-1], None)
        out = mvn.logpdf(x[0], m0, chol_P0)
        out += jnp.sum(mvn.logpdf(x[1:], pred_x, chol_Q))
        pred_y = jnp.einsum("ijk,ik->ij", jnp.nan_to_num(Hs), x) + cs
        mask = jnp.isfinite(ys[:, 0])
        diff = jnp.where(mask[:, None], jnp.nan_to_num(ys) - pred_y, 0.0)
        w = jnp.einsum("tij,tj->ti", inv_chol_Rs, diff)
        step = -0.5 * jnp.sum(w * w, -1) - logdet_Rs \
            - 0.5 * dy * _math.log(2.0 * _math.pi)
        return out + jnp.sum(jnp.where(mask, step, 0.0))

    return get_kalman_generic(dynamics_factory, observations_factory,
                              log_likelihood_fn, parallel)


def get_gibbs_kernel(ys, Hs, Rs, cs, m0, P0, sigma_x, dt, sigma_theta, parallel):
    """Gibbs sampler alternating the trajectory kernel (at the current theta)
    with the conjugate theta draw. The Kalman kernel is constructed inside
    the step as a closure over the traced theta — one compiled program, no
    retracing across iterations (reference experiment.py:108-117 pattern,
    SURVEY hard-part 4)."""
    import chex

    @chex.dataclass
    class GibbsState:
        kalman_state: chex.ArrayTree
        theta: chex.Array

        @property
        def x(self):
            return self.kalman_state.x

        @property
        def updated(self):
            return self.kalman_state.updated

    # Theta-independent target factorisations, computed ONCE outside the
    # traced step (inside it they would re-run every Gibbs iteration — XLA
    # does not hoist Cholesky custom calls out of while bodies).
    whiteners = target_whiteners(m0, P0, Rs, sigma_x, dt)

    def kernel(key, state, delta):
        key_traj, key_theta = jax.random.split(key)
        _, kalman_kernel = get_kalman_kernel(
            ys, Hs, Rs, cs, m0, P0, state.theta, sigma_x, dt, parallel,
            whiteners=whiteners,
        )
        kalman_state = kalman_kernel(key_traj, state.kalman_state, delta)
        mean, chol = theta_posterior_mean_and_chol(kalman_state.x, sigma_theta, dt, sigma_x)
        theta = mean + chol * jax.random.normal(key_theta, (3,), dtype=mean.dtype)
        return GibbsState(kalman_state=kalman_state, theta=theta)

    def init(x, theta):
        from ..kernels.kalman import KalmanSampler
        # log_target stays None (the default) on purpose: the target density
        # depends on theta, which changes every Gibbs step, so the Kalman
        # kernel's cross-step log-target cache would be stale here. None turns
        # the cache off and the kernel recomputes — same law, always valid.
        return GibbsState(
            kalman_state=KalmanSampler(x=x, updated=jnp.asarray(True)),
            theta=jnp.asarray(theta),
        )

    return init, kernel
