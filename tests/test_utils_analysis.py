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
