import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aux_ssm_tpu.ops.filtering import filtering
from aux_ssm_tpu.ops.sampling import sampling
from aux_ssm_tpu.ops.lgssm import LGSSM

from oracles import explicit_filter, explicit_smoother, random_lgssm, simulate


@pytest.fixture(scope="module")
def small_model():
    rng = np.random.default_rng(0)
    T, dx, dy = 8, 2, 2
    params = random_lgssm(rng, T, dx, dy)
    ys = simulate(rng, *params)
    return params, ys


@pytest.mark.parametrize("parallel", [False, True])
def test_sampling_matches_smoother_moments(small_model, parallel):
    """Statistical test: many pathwise samples must reproduce the RTS
    smoother's marginal means/stds (contract from reference
    test_sampling.py:23-68)."""
    params, ys = small_model
    ms_f, Ps_f, _ = explicit_filter(ys, *params)
    msm, Psm = explicit_smoother(ms_f, Ps_f, params[2], params[3], params[4])

    lgssm = LGSSM(*map(jnp.asarray, params))
    ms, Ps, _ = filtering(jnp.asarray(ys), lgssm, parallel)

    n = 100_000
    keys = jax.random.split(jax.random.key(42), n)
    draws = jax.vmap(lambda k: sampling(k, ms, Ps, lgssm, parallel))(keys)
    draws = np.asarray(draws)

    std = np.sqrt(np.einsum("tii->ti", Psm))
    np.testing.assert_allclose(draws.mean(0), msm, atol=4 * std.max() / np.sqrt(n) * 4)
    np.testing.assert_allclose(draws.std(0), std, rtol=0.05)


def test_parallel_and_sequential_same_law(small_model):
    """Parallel and sequential sampling use the same per-step noise layout, so
    with the same key they must produce identical trajectories."""
    params, ys = small_model
    lgssm = LGSSM(*map(jnp.asarray, params))
    ms, Ps, _ = filtering(jnp.asarray(ys), lgssm, False)
    key = jax.random.key(1)
    xs_seq = sampling(key, ms, Ps, lgssm, False)
    xs_par = sampling(key, ms, Ps, lgssm, True)
    np.testing.assert_allclose(xs_seq, xs_par, atol=1e-9)


def test_batched_sampling_matches_per_model():
    """Batched (T,B,dx) sampling must equal running each 1-D model separately
    ... statistically (keys differ); check marginal moments per batch member."""
    rng = np.random.default_rng(9)
    T, B = 6, 4
    m0, P0, Fs, Qs, bs, Hs, Rs, cs = random_lgssm(rng, T, 1, 1, batched=True, B=B)
    ys = np.stack(
        [simulate(rng, m0[b], P0[b], Fs[:, b], Qs[:, b], bs[:, b], Hs[:, b], Rs[:, b], cs[:, b])
         for b in range(B)],
        axis=1,
    )
    lgssm = LGSSM(*map(jnp.asarray, (m0, P0, Fs, Qs, bs, Hs, Rs, cs)))
    ms, Ps, _ = filtering(jnp.asarray(ys), lgssm, False)
    assert ms.shape == (T, B, 1)

    n = 50_000
    keys = jax.random.split(jax.random.key(7), n)
    draws = np.asarray(jax.vmap(lambda k: sampling(k, ms, Ps, lgssm, True))(keys))

    for b in range(B):
        ms_f, Ps_f, _ = explicit_filter(
            ys[:, b], m0[b], P0[b], Fs[:, b], Qs[:, b], bs[:, b], Hs[:, b], Rs[:, b], cs[:, b]
        )
        msm, Psm = explicit_smoother(ms_f, Ps_f, Fs[:, b], Qs[:, b], bs[:, b])
        np.testing.assert_allclose(draws[:, :, b, 0].mean(0), msm[:, 0], atol=0.05)
        np.testing.assert_allclose(
            draws[:, :, b, 0].std(0), np.sqrt(Psm[:, 0, 0]), rtol=0.05
        )
