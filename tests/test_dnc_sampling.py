"""D&C Gaussian-bridge sampler vs smoother moments and the scan sampler."""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aux_ssm_tpu.ops.filtering import filtering
from aux_ssm_tpu.ops import dnc_sampling
from aux_ssm_tpu.ops.lgssm import LGSSM

from oracles import explicit_filter, explicit_smoother, random_lgssm, simulate


@pytest.mark.slow
@pytest.mark.parametrize("T", [6, 9])
def test_matches_smoother_moments(T):
    rng = np.random.default_rng(0)
    params = random_lgssm(rng, T, 2, 2)
    ys = simulate(rng, *params)

    lgssm = LGSSM(*map(jnp.asarray, params))
    ms, Ps, _ = filtering(jnp.asarray(ys), lgssm, False)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", UserWarning)
        n = 40_000
        keys = jax.random.split(jax.random.key(1), n)
        draws = np.asarray(jax.vmap(
            lambda k: dnc_sampling.sampling(k, ms, Ps, lgssm))(keys))

    ms_f, Ps_f, _ = explicit_filter(ys, *params)
    msm, Psm = explicit_smoother(ms_f, Ps_f, params[2], params[3], params[4])
    std = np.sqrt(np.einsum("tii->ti", Psm))

    np.testing.assert_allclose(draws.mean(0), msm, atol=5 * std.max() / np.sqrt(n) * 4)
    np.testing.assert_allclose(draws.std(0), std, rtol=0.05)
    # joint covariance across time (bridge correctness, not just marginals)
    emp_lag1 = np.mean(
        (draws[:, :-1, 0] - draws[:, :-1, 0].mean(0)) *
        (draws[:, 1:, 0] - draws[:, 1:, 0].mean(0)), axis=0)
    # smoother lag-1 cross-covariances via joint sampling oracle: compare to
    # the associative-scan sampler's empirical lag-1 (same law)
    from aux_ssm_tpu.ops.sampling import sampling as scan_sampling
    draws2 = np.asarray(jax.vmap(
        lambda k: scan_sampling(k, ms, Ps, lgssm, True))(keys))
    ref_lag1 = np.mean(
        (draws2[:, :-1, 0] - draws2[:, :-1, 0].mean(0)) *
        (draws2[:, 1:, 0] - draws2[:, 1:, 0].mean(0)), axis=0)
    np.testing.assert_allclose(emp_lag1, ref_lag1, atol=0.05)


def test_rejects_batched():
    with pytest.raises(ValueError):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", UserWarning)
            dnc_sampling.sampling(
                jax.random.key(0), jnp.zeros((4, 3, 2)), jnp.zeros((4, 3, 2, 2)),
                LGSSM(*[jnp.zeros(())] * 8))
