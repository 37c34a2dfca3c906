"""Fused element/ell/affine-scan Pallas kernels vs the XLA implementations
(interpret mode; hardware covered by bench/graft runs)."""
import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aux_ssm_tpu.ops.pallas.kalman_fused import (
    fused_make_elements, fused_ell, fused_affine_scan,
)
from aux_ssm_tpu.ops.sampling import sampling_operator

F = importlib.import_module("aux_ssm_tpu.ops.filtering")


def _model(T, dx, dy, seed=0, nan_frac=0.0):
    from oracles import random_lgssm, simulate
    rng = np.random.default_rng(seed)
    params = random_lgssm(rng, T, dx, dy)
    ys = simulate(rng, *params)
    if nan_frac:
        ys = np.where(rng.uniform(size=ys.shape) < nan_frac, np.nan, ys)
    arrs = tuple(map(jnp.asarray, params))
    return arrs, jnp.asarray(ys)


@pytest.mark.parametrize("T,dx,dy,nan_frac", [
    (23, 2, 2, 0.0), (64, 4, 3, 0.3), (140, 3, 1, 0.0),
])
def test_fused_elements_and_ell(T, dx, dy, nan_frac):
    (m0, P0, Fs, Qs, bs, Hs, Rs, cs), ys = _model(T, dx, dy, nan_frac=nan_frac)
    m0u, P0u, _ = F.kalman_update(ys[0], m0, P0, Hs[0], cs[0], Rs[0])

    want = F._make_associative_elements(Fs, Qs, bs, Hs[1:], Rs[1:], cs[1:],
                                        ys[1:], m0u, P0u)

    m_el = jnp.concatenate([m0u[None], jnp.zeros((T - 2, dx))], 0)
    P_el = jnp.concatenate([P0u[None], jnp.zeros((T - 2, dx, dx))], 0)
    got = fused_make_elements(Fs, Qs, bs, Hs[1:], Rs[1:], cs[1:], ys[1:],
                              m_el, P_el, interpret=True)
    for w, g, n in zip(want, got, "AbCeJ"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-10,
                                   atol=1e-12, err_msg=n)

    # ell increments at the filtered means
    _, ms, Ps, _, _ = jax.lax.associative_scan(F.filtering_operator, want)
    ms = jnp.concatenate([m0u[None], ms], 0)
    Ps = jnp.concatenate([P0u[None], Ps], 0)
    *_, want_ell = F.kalman_predict_update(ms[:-1], Ps[:-1], Fs, bs, Qs,
                                           ys[1:], Hs[1:], cs[1:], Rs[1:])
    got_ell = fused_ell(Fs, Qs, bs, Hs[1:], Rs[1:], cs[1:], ys[1:],
                        ms[:-1], Ps[:-1], interpret=True)
    np.testing.assert_allclose(np.asarray(got_ell), np.asarray(want_ell),
                               rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("T,d,reverse", [(50, 3, True), (256, 2, True),
                                         (100, 4, False)])
def test_fused_affine_scan(T, d, reverse):
    rng = np.random.default_rng(1)
    gains = jnp.asarray(0.4 * rng.standard_normal((T, d, d)))
    incs = jnp.asarray(rng.standard_normal((T, d)))
    want = jax.lax.associative_scan(sampling_operator, (gains, incs),
                                    reverse=reverse)
    got = fused_affine_scan(gains, incs, reverse=reverse, interpret=True)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                               rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("T,dx,dy,nan_frac", [(30, 2, 2, 0.0), (70, 3, 2, 0.4)])
def test_fused_logdensity_steps(T, dx, dy, nan_frac):
    from aux_ssm_tpu.ops.pallas.kalman_fused import fused_logdensity_steps
    from aux_ssm_tpu.ops.lgssm import LGSSM, log_likelihood, prior_logpdf

    (m0, P0, Fs, Qs, bs, Hs, Rs, cs), ys = _model(T, dx, dy, seed=2,
                                                  nan_frac=nan_frac)
    xs = jnp.asarray(np.random.default_rng(3).standard_normal((T, dx)))
    lg = LGSSM(m0, P0, Fs, Qs, bs, Hs, Rs, cs)

    want = log_likelihood(ys, xs, lg) + prior_logpdf(xs, lg)
    steps = fused_logdensity_steps(Fs, Qs, bs, Hs[1:], Rs[1:], cs[1:], ys[1:],
                                   xs[:-1], xs[1:], interpret=True)
    from aux_ssm_tpu.ops.lgssm import _masked_step_logpdf
    from aux_ssm_tpu.ops import mvn
    pred0 = jnp.einsum("ij,j->i", Hs[0], xs[0]) + cs[0]
    first = mvn.logpdf(xs[0], m0, jnp.linalg.cholesky(P0)) \
        + _masked_step_logpdf(ys[0], pred0, Rs[0])
    got = float(first + jnp.sum(steps))
    np.testing.assert_allclose(got, float(want), rtol=1e-9)


@pytest.mark.parametrize("T,dx", [(40, 2), (100, 4)])
def test_fused_backward_maps(T, dx):
    from aux_ssm_tpu.ops.pallas.kalman_fused import fused_backward_maps
    from aux_ssm_tpu.ops.batched import mv
    from aux_ssm_tpu.ops.sampling import backward_map_moments

    (m0, P0, Fs, Qs, bs, Hs, Rs, cs), ys = _model(T, dx, 2, seed=5)
    from aux_ssm_tpu.ops.filtering import filtering
    from aux_ssm_tpu.ops.lgssm import LGSSM
    lg = LGSSM(m0, P0, Fs, Qs, bs, Hs, Rs, cs)
    ms, Ps, _ = filtering(ys, lg, False)

    eps = jnp.asarray(np.random.default_rng(6).standard_normal((T - 1, dx)))
    inc_m, L, gains_w = backward_map_moments(Fs, Qs, bs, ms[:-1], Ps[:-1])
    incs_w = inc_m + mv(L, eps)

    gains_g, incs_g = fused_backward_maps(Fs, Qs, bs, ms[:-1], Ps[:-1], eps,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(gains_g), np.asarray(gains_w),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(incs_g), np.asarray(incs_w),
                               rtol=1e-6, atol=1e-8)
