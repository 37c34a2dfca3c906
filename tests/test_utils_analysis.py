"""Analysis/profiling utilities."""
import numpy as np
import jax.numpy as jnp

from aux_ssm_tpu.utils.analysis import ejsd_per_time, moment_errors, ess_summary
from aux_ssm_tpu.utils.profiling import timer


def test_ejsd_per_time():
    out = ejsd_per_time(np.full((4,), 2.0), sampling_time=10.0, n_samples=100)
    np.testing.assert_allclose(out, 20.0)


def test_moment_errors():
    em, es = moment_errors(1.1, 2.2, 1.0, 2.0)
    np.testing.assert_allclose(em, 0.01 / 4.0)
    np.testing.assert_allclose(es, 0.1)


def test_ess_summary():
    rng = np.random.default_rng(0)
    s = rng.standard_normal((5000, 8, 2))
    out = ess_summary(s)
    assert set(out) == {(2, 0), (4, 0), (6, 0)}
    for v in out.values():
        assert 3000 < v < 7000  # iid chain: ESS ~ n


def test_timer():
    with timer("x", sync=jnp.ones(3)) as box:
        _ = jnp.ones(3) * 2
    assert box["seconds"] >= 0 and box["label"] == "x"


def test_potential_scale_reduction_mixed_chains():
    rng = np.random.default_rng(3)
    chains = rng.standard_normal((8, 4000))
    for rn in (True, False):
        r = float(__import__("aux_ssm_tpu.utils.ess", fromlist=["x"])
                  .potential_scale_reduction(chains, rank_normalized=rn))
        assert 0.99 < r < 1.01, r


def test_potential_scale_reduction_detects_disagreement():
    from aux_ssm_tpu.utils import potential_scale_reduction
    rng = np.random.default_rng(4)
    chains = rng.standard_normal((8, 2000))
    chains[0] += 5.0  # one chain stuck in a different mode
    assert float(potential_scale_reduction(chains)) > 1.2
    # Within-chain drift is caught by the split (classical R-hat on unsplit
    # chains would miss a trend shared by all chains).
    drift = rng.standard_normal((4, 2000)) + np.linspace(0, 4, 2000)
    assert float(potential_scale_reduction(drift)) > 1.2


def test_potential_scale_reduction_heavy_tails():
    from aux_ssm_tpu.utils import potential_scale_reduction
    rng = np.random.default_rng(5)
    chains = rng.standard_t(df=1.5, size=(8, 4000))  # infinite variance
    r = float(potential_scale_reduction(chains))
    assert 0.99 < r < 1.01, r


def test_rhat_summary():
    from aux_ssm_tpu.utils.analysis import rhat_summary
    rng = np.random.default_rng(6)
    s = rng.standard_normal((8, 1000, 12, 2))
    out = rhat_summary(s)
    assert set(out) == {(3, 0), (6, 0), (9, 0)}
    assert all(0.99 < v < 1.02 for v in out.values())
    s[0] += 4.0
    bad = rhat_summary(s)
    assert all(v > 1.2 for v in bad.values())
    try:
        rhat_summary(s[0])
    except ValueError as e:
        assert "n_chains" in str(e)
    else:
        raise AssertionError("expected ValueError on single-chain input")
