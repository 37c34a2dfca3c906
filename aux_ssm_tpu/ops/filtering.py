"""Kalman filtering: sequential scan and parallel-in-time associative scan.

Capability parity with `_primitives/kalman/filtering.py` (entry point :18-46,
sequential :66-79, parallel prefix-sum filter :49-63 with operator :152-183
and init :188-250) — independent, mask-based implementation.

The parallel filter is the Särkkä & García-Fernández (2021) formulation: each
time step contributes a 5-tuple element (A, b, C, eta, J) such that filtering
is an associative combination of elements; `jax.lax.associative_scan` then
gives O(log T) depth. All per-element ops are gufunc-vectorized so the same
code runs the batched `(T, B, ...)` layout, and everything is finite-valued
(missing data handled by masked projection, see `lgssm.mask_observation`) so
there are no `lax.cond` branches — every lane does identical work, which is
what the TPU VPU/MXU want.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_solve, solve

from .lgssm import LGSSM, mask_observation, _LOG_2PI


def filtering(ys, lgssm: LGSSM, parallel: bool):
    """Kalman filter.

    Parameters
    ----------
    ys : Array (T, dy) or (T, B, dy)
        Observations; NaN components are treated as missing.
    lgssm : LGSSM
        Model parameters (see `lgssm.LGSSM` for shapes).
    parallel : bool
        If True, run the O(log T)-depth associative-scan filter; otherwise a
        sequential `lax.scan`.

    Returns
    -------
    ms : Array (T, [B,] dx) — filtered means
    Ps : Array (T, [B,] dx, dx) — filtered covariances
    ell : scalar — marginal log-likelihood log p(y_{0:T}) (summed over batch)
    """
    m0, P0, Fs, Qs, bs, Hs, Rs, cs = lgssm
    impl = _parallel_filtering if parallel else _sequential_filtering
    ms, Ps, ell = impl(m0, P0, ys, Fs, Qs, bs, Hs, Rs, cs)
    if jnp.ndim(ell) >= 1:
        ell = jnp.sum(ell)
    return ms, Ps, ell


#                                   y,    m,     P,     H,    c,    R   ->  m,     P,    ell
@partial(jnp.vectorize, signature="(dy),(dx),(dx,dx),(dy,dx),(dy),(dy,dy)->(dx),(dx,dx),()")
def kalman_update(y, m, P, H, c, R):
    """Masked measurement update. Missing components of `y` drop out exactly;
    a fully-missing step reduces to the identity (G = 0, ell_inc = 0)."""
    y_eff, H_eff, c_eff, R_eff, mask = mask_observation(y, H, c, R)
    n_obs = jnp.sum(mask.astype(m.dtype))

    y_hat = H_eff @ m + c_eff
    innov = jnp.where(mask, y_eff - y_hat, 0.0)

    S = R_eff + H_eff @ P @ H_eff.T
    S = 0.5 * (S + S.T)

    if y.shape[-1] == 1:
        chol_S = jnp.sqrt(S)
        G = (P @ H_eff.T) / S
        w = innov / chol_S[0]
    else:
        chol_S = jnp.linalg.cholesky(S)
        G = cho_solve((chol_S, True), H_eff @ P).T
        w = jax.scipy.linalg.solve_triangular(chol_S, innov, lower=True)

    # Masked-block Cholesky has unit diagonal on missing components, so the
    # log-determinant and quadratic form automatically count observed dims.
    log_det = jnp.sum(jnp.log(jnp.diagonal(chol_S)))
    ell_inc = -0.5 * jnp.sum(w * w) - log_det - 0.5 * n_obs * _LOG_2PI

    m_new = m + G @ innov
    P_new = P - G @ S @ G.T
    P_new = 0.5 * (P_new + P_new.T)
    return m_new, P_new, ell_inc


@partial(jnp.vectorize, signature="(dx),(dx,dx),(dx,dx),(dx),(dx,dx)->(dx),(dx,dx)")
def kalman_predict(m, P, F, b, Q):
    m = F @ m + b
    P = Q + F @ P @ F.T
    return m, 0.5 * (P + P.T)


def kalman_predict_update(m, P, F, b, Q, y, H, c, R):
    m, P = kalman_predict(m, P, F, b, Q)
    return kalman_update(y, m, P, H, c, R)


def _sequential_filtering(m0, P0, ys, Fs, Qs, bs, Hs, Rs, cs):
    m0, P0, ell0 = kalman_update(ys[0], m0, P0, Hs[0], cs[0], Rs[0])

    def body(carry, inp):
        m, P, ell = carry
        F, Q, b, H, R, c, y = inp
        m, P, ell_inc = kalman_predict_update(m, P, F, b, Q, y, H, c, R)
        return (m, P, ell + ell_inc), (m, P)

    (_, _, ell), (ms, Ps) = jax.lax.scan(
        body, (m0, P0, ell0), (Fs, Qs, bs, Hs[1:], Rs[1:], cs[1:], ys[1:])
    )
    ms = jnp.concatenate([m0[None], ms], axis=0)
    Ps = jnp.concatenate([P0[None], Ps], axis=0)
    return ms, Ps, ell


def _parallel_filtering(m0, P0, ys, Fs, Qs, bs, Hs, Rs, cs):
    m0, P0, ell0 = kalman_update(ys[0], m0, P0, Hs[0], cs[0], Rs[0])

    elems = _make_associative_elements(Fs, Qs, bs, Hs[1:], Rs[1:], cs[1:], ys[1:], m0, P0)
    _, ms, Ps, _, _ = jax.lax.associative_scan(jax.vmap(filtering_operator), elems)

    ms = jnp.concatenate([m0[None], ms], axis=0)
    Ps = jnp.concatenate([P0[None], Ps], axis=0)

    # The scan produces the filtered means/covs; the log-likelihood increments
    # are recovered by one embarrassingly-parallel predict+update per step.
    *_, ell_incs = jax.vmap(kalman_predict_update)(
        ms[:-1], Ps[:-1], Fs, bs, Qs, ys[1:], Hs[1:], cs[1:], Rs[1:]
    )
    return ms, Ps, ell0 + jnp.sum(ell_incs, axis=0)


# --- associative elements -------------------------------------------------

_ELEM_SIG = "(dx,dx),(dx),(dx,dx),(dx),(dx,dx)"


def filtering_operator(elem1, elem2):
    """Associative combination of two filtering elements (SGF 2021, Lemma 8)."""
    return _filtering_op(*elem1, *elem2)


@partial(jnp.vectorize, signature=f"{_ELEM_SIG},{_ELEM_SIG}->{_ELEM_SIG}")
def _filtering_op(A1, b1, C1, eta1, J1, A2, b2, C2, eta2, J2):
    dx = b1.shape[0]
    I = jnp.eye(dx, dtype=A1.dtype)

    IpCJ = I + C1 @ J2
    IpJC = I + J2 @ C1
    if dx == 1:
        A2_over = A2 / IpCJ
        A1_over = A1 / IpJC
    else:
        # X = A2 (I + C1 J2)^{-1}  and  Y = (I + J2 C1)^{-T} A1 ... computed
        # as transposed solves to keep a single LU each.
        A2_over = solve(IpCJ.T, A2.T).T
        A1_over = solve(IpJC.T, A1).T

    A = A2_over @ A1
    b = A2_over @ (b1 + C1 @ eta2) + b2
    C = A2_over @ (C1 @ A2.T) + C2
    eta = A1_over @ (eta2 - J2 @ b1) + eta1
    J = A1_over @ (J2 @ A1) + J1
    return A, b, 0.5 * (C + C.T), eta, 0.5 * (J + J.T)


def _make_associative_elements(Fs, Qs, bs, Hs, Rs, cs, ys, m0, P0):
    T = bs.shape[0]
    zeros_m = jnp.zeros_like(m0, shape=(T - 1,) + m0.shape)
    zeros_P = jnp.zeros_like(P0, shape=(T - 1,) + P0.shape)
    ms = jnp.concatenate([m0[None], zeros_m], axis=0)
    Ps = jnp.concatenate([P0[None], zeros_P], axis=0)
    return _make_one_element(Fs, Qs, bs, Hs, Rs, cs, ys, ms, Ps)


@partial(jnp.vectorize,
         signature="(dx,dx),(dx,dx),(dx),(dy,dx),(dy,dy),(dy),(dy),(dx),(dx,dx)->" + _ELEM_SIG)
def _make_one_element(F, Q, b, H, R, c, y, m, P):
    """Build one associative element. For the first element `m, P` carry the
    updated initial state; for the rest they are zero (the element then
    represents the generic predict+update map). Fully-missing observations
    reduce (exactly, via masking) to the pure-prediction element the reference
    special-cases with `lax.cond` (`filtering.py:239-250`)."""
    y_eff, H_eff, c_eff, R_eff, mask = mask_observation(y, H, c, R)

    m_pred = F @ m + b
    P_pred = F @ P @ F.T + Q

    S = H_eff @ P_pred @ H_eff.T + R_eff
    S = 0.5 * (S + S.T)
    if y.shape[0] == 1:
        S_invH_T = H_eff.T / S[0, 0]
    else:
        chol_S = jnp.linalg.cholesky(S)
        S_invH_T = cho_solve((chol_S, True), H_eff).T

    K = P_pred @ S_invH_T
    A = F - K @ H_eff @ F

    y_diff_b = jnp.where(mask, y_eff - H_eff @ b - c_eff, 0.0)
    y_diff_m = jnp.where(mask, y_eff - H_eff @ m_pred - c_eff, 0.0)

    b_el = m_pred + K @ y_diff_m
    C = P_pred - K @ S @ K.T

    temp = F.T @ S_invH_T
    eta = temp @ y_diff_b
    J = temp @ H_eff @ F
    return A, b_el, 0.5 * (C + C.T), eta, 0.5 * (J + J.T)
