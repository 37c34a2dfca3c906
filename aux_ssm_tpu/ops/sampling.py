"""Pathwise backward sampling from the smoothing distribution of an LGSSM.

Capability parity with `_primitives/kalman/sampling.py` (entry :11-40,
affine operator :44-55, init :60-136) — independent implementation.

Given filtered moments (ms, Ps), one joint smoothing draw x_{0:T} is obtained
by composing affine-Gaussian backward maps x_t = G_t x_{t+1} + e_t, where e_t
already contains the sampled noise. Composition of affine maps is associative,
so the whole trajectory is a reverse associative scan (O(log T) depth) or a
reverse sequential scan.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_solve

from .chol import safe_cholesky
from .lgssm import LGSSM


def sampling(key, ms, Ps, lgssm: LGSSM, parallel: bool):
    """Sample one trajectory from p(x_{0:T} | y_{0:T}).

    Parameters
    ----------
    key : PRNG key
    ms, Ps : filtered means/covariances from `filtering`
    lgssm : LGSSM
    parallel : bool
        Reverse associative scan (True) or reverse sequential scan.

    Returns
    -------
    xs : Array with the same shape as `ms`.
    """
    gains, incs = _backward_maps(key, ms, Ps, lgssm.Fs, lgssm.Qs, lgssm.bs)
    if parallel:
        _, xs = jax.lax.associative_scan(jax.vmap(sampling_operator), (gains, incs), reverse=True)
    else:
        def body(carry, inp):
            carry = sampling_operator(carry, inp)
            return carry, carry

        _, (_, xs) = jax.lax.scan(
            body, (gains[-1], incs[-1]), (gains[:-1], incs[:-1]), reverse=True
        )
        xs = jnp.concatenate([xs, incs[None, -1]], axis=0)
    return xs


def sampling_operator(elem1, elem2):
    """Composition of affine maps: (G1,e1) then (G2,e2) -> (G2 G1, G2 e1 + e2)."""
    G1, e1 = elem1
    G2, e2 = elem2
    return _sampling_op(G1, e1, G2, e2)


@partial(jnp.vectorize, signature="(dx,dx),(dx),(dx,dx),(dx)->(dx,dx),(dx)")
def _sampling_op(G1, e1, G2, e2):
    return G2 @ G1, G2 @ e1 + e2


@partial(jnp.vectorize, signature="(dx,dx),(dx,dx),(dx),(dx),(dx,dx)->(dx),(dx,dx),(dx,dx)")
def backward_map_moments(F, Q, b, m, P):
    """Moments of the backward conditional x_t | x_{t+1} at filtered (m, P):
    mean = inc_m + gain @ x_{t+1}, covariance = L L^T."""
    dx = m.shape[0]
    S = F @ P @ F.T + Q
    S = 0.5 * (S + S.T)

    if dx == 1:
        gain = P * F / S
    else:
        chol_S = safe_cholesky(S)
        gain = cho_solve((chol_S, True), F @ P).T

    cov = P - gain @ S @ gain.T
    inc_m = m - gain @ (F @ m + b)
    # Zero-uncertainty steps give a singular cov; safe_cholesky returns a
    # usable (zeroed) factor there, matching the reference's nan_to_num guard
    # (`sampling.py:103-104`).
    L = safe_cholesky(cov) if dx > 1 else jnp.sqrt(jnp.maximum(cov, 0.0))
    return inc_m, L, gain


@partial(jnp.vectorize, signature="(dx,dx),(dx,dx),(dx),(dx),(dx,dx),(dx)->(dx,dx),(dx)")
def _backward_map_one(F, Q, b, m, P, eps):
    inc_m, L, gain = backward_map_moments(F, Q, b, m, P)
    return gain, inc_m + L @ eps


@partial(jnp.vectorize, signature="(dx),(dx,dx),(dx)->(dx,dx),(dx)")
def _last_step_draw(m, P, eps):
    dx = P.shape[0]
    L = safe_cholesky(P) if dx > 1 else jnp.sqrt(jnp.maximum(P, 0.0))
    return jnp.zeros_like(P), m + L @ eps


def _backward_maps(key, ms, Ps, Fs, Qs, bs):
    eps = jax.random.normal(key, shape=ms.shape, dtype=ms.dtype)
    gains, incs = jax.vmap(_backward_map_one)(Fs, Qs, bs, ms[:-1], Ps[:-1], eps[:-1])
    last_gain, last_inc = _last_step_draw(ms[-1], Ps[-1], eps[-1])
    gains = jnp.concatenate([gains, last_gain[None]], axis=0)
    incs = jnp.concatenate([incs, last_inc[None]], axis=0)
    return gains, incs
