"""Fused Pallas filter scan vs the XLA associative_scan path (interpret
mode on CPU; the TPU build is exercised by bench/graft on hardware)."""
import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aux_ssm_tpu.ops.pallas.filter_scan import (
    fused_filter_scan, _fused_filter_scan_chunked)

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


@pytest.mark.parametrize("T,dx,dy", [(17, 2, 2), (64, 4, 3), (129, 3, 1),
                                     (300, 3, 2)])
def test_chunked_matches_xla_scan(T, dx, dy):
    """The work-efficient chunked kernel (default on TPU at T >= 512; called
    directly here because the jitted entry caches the env-selected mode per
    shape) must match the XLA scan at every T — including padded non-block
    shapes where S is 1 or 2."""
    elems = _elements(T, dx, dy)
    want = jax.lax.associative_scan(F.filtering_operator, elems)
    got = _fused_filter_scan_chunked(elems, interpret=True)
    for w, g, name in zip(want, got, "AbCeJ"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-6,
                                   atol=1e-8, err_msg=name)


def test_chunked_f32_accuracy():
    """f32 chunked association vs the f64 oracle — same band as the HS
    kernel (hardware study: both kernels ~1e-7 norm-relative at the T=1024
    d=16 headline shape, benchmarks/RESULTS_r5.md)."""
    elems = _elements(40, 3, 2, seed=3)
    elems32 = jax.tree.map(lambda z: z.astype(jnp.float32), elems)
    want = jax.lax.associative_scan(F.filtering_operator, elems)  # f64 oracle
    got = _fused_filter_scan_chunked(elems32, interpret=True)
    for w, g, name in zip(want, got, "AbCeJ"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=5e-4,
                                   atol=5e-5, err_msg=name)


def test_f32_accuracy():
    elems = _elements(40, 3, 2, seed=3)
    elems32 = jax.tree.map(lambda z: z.astype(jnp.float32), elems)
    want = jax.lax.associative_scan(F.filtering_operator, elems)  # f64 oracle
    got = fused_filter_scan(elems32, interpret=True)
    # Gauss-Jordan without pivoting must stay close to the f64 result.
    for w, g, name in zip(want, got, "AbCeJ"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=5e-4,
                                   atol=5e-5, err_msg=name)


@pytest.mark.slow
def test_f32_accuracy_T1024_norm_relative():
    """Round-3 accuracy study (VERDICT weak #4): at the headline shape the
    Hillis-Steele kernel's f32 error vs an f64 oracle is at XLA-f32-scan
    parity — per-step NORM-relative error <= 5e-6 on every output (the
    round-2 "~1e-3 on b" number was an f32-vs-f32 near-zero elementwise
    artifact). Pinned here so a regression in the combine's numerics (e.g.
    a pivoting change in gj_inv) is caught at the real scale."""
    elems = _elements(1025, 4, 3, seed=7)
    elems32 = jax.tree.map(lambda z: z.astype(jnp.float32), elems)
    want = jax.lax.associative_scan(F.filtering_operator, elems)  # f64
    got = fused_filter_scan(elems32, interpret=True)
    T = elems[1].shape[0]
    # A's norm decays geometrically toward 0 so its norm-relative is the
    # noisiest (measured 6e-6); the statistics that feed the sampler (b, C,
    # e, J) sit at or below 5e-6.
    bounds = {"A": 2e-5, "b": 5e-6, "C": 5e-6, "e": 5e-6, "J": 5e-6}
    for w, g, name in zip(want, got, "AbCeJ"):
        w = np.asarray(w)
        g = np.asarray(g, np.float64)
        nrel = (np.abs(g - w).reshape(T, -1).max(1)
                / (np.abs(w).reshape(T, -1).max(1) + 1e-30))
        assert nrel.max() < bounds[name], (name, nrel.max())
