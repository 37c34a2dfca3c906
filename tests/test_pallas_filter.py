"""Fused Pallas filter scan vs the XLA associative_scan path (interpret
mode on CPU; the TPU build is exercised by bench/graft on hardware)."""
import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aux_ssm_tpu.ops.pallas.filter_scan import fused_filter_scan

F = importlib.import_module("aux_ssm_tpu.ops.filtering")


def _elements(T, dx, dy, seed=0):
    from oracles import random_lgssm, simulate
    rng = np.random.default_rng(seed)
    params = random_lgssm(rng, T, dx, dy)
    ys = simulate(rng, *params)
    m0, P0, Fs, Qs, bs, Hs, Rs, cs = map(
        lambda z: jnp.asarray(z, jnp.float64), params
    )
    ysj = jnp.asarray(ys, jnp.float64)
    m0u, P0u, _ = F.kalman_update(ysj[0], m0, P0, Hs[0], cs[0], Rs[0])
    return F._make_associative_elements(Fs, Qs, bs, Hs[1:], Rs[1:], cs[1:],
                                        ysj[1:], m0u, P0u)


@pytest.mark.parametrize("T,dx,dy", [(17, 2, 2), (64, 4, 3), (129, 3, 1)])
def test_matches_xla_scan(T, dx, dy):
    elems = _elements(T, dx, dy)
    want = jax.lax.associative_scan(F.filtering_operator, elems)
    got = fused_filter_scan(elems, interpret=True)
    for w, g, name in zip(want, got, "AbCeJ"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-6,
                                   atol=1e-8, err_msg=name)


def test_f32_accuracy():
    elems = _elements(40, 3, 2, seed=3)
    elems32 = jax.tree.map(lambda z: z.astype(jnp.float32), elems)
    want = jax.lax.associative_scan(F.filtering_operator, elems)  # f64 oracle
    got = fused_filter_scan(elems32, interpret=True)
    # Gauss-Jordan without pivoting must stay close to the f64 result.
    for w, g, name in zip(want, got, "AbCeJ"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=5e-4,
                                   atol=5e-5, err_msg=name)
