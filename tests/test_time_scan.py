"""Time-sharded associative scans on the 8-way virtual mesh vs the
single-device scans."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aux_ssm_tpu.parallel.mesh import make_mesh
from aux_ssm_tpu.parallel.time_scan import (
    sharded_associative_scan, sharded_filtering_scan, sharded_sampling_scan, TIME,
)


@pytest.fixture(scope="module")
def tmesh():
    return make_mesh(axis_names=(TIME,))


def test_scalar_cumsum(tmesh):
    x = jnp.arange(1.0, 65.0)
    got = sharded_associative_scan(tmesh, jnp.add, x)
    np.testing.assert_allclose(np.asarray(got), np.cumsum(np.arange(1.0, 65.0)))


def test_scalar_reverse_cumsum_odd_T(tmesh):
    x = jnp.arange(1.0, 22.0)   # 21 elements over 8 shards
    got = sharded_associative_scan(tmesh, jnp.add, x, reverse=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.cumsum(np.asarray(x)[::-1])[::-1])


def test_scalar_reverse_cumsum(tmesh):
    x = jnp.arange(1.0, 65.0)
    got = sharded_associative_scan(tmesh, jnp.add, x, reverse=True)
    want = np.cumsum(np.arange(1.0, 65.0)[::-1])[::-1]
    np.testing.assert_allclose(np.asarray(got), want)


def test_filtering_elements(tmesh):
    import importlib
    F = importlib.import_module("aux_ssm_tpu.ops.filtering")
    from oracles import random_lgssm, simulate

    T, dx, dy = 64, 3, 2
    rng = np.random.default_rng(0)
    params = random_lgssm(rng, T, dx, dy)
    ys = simulate(rng, *params)
    m0, P0, Fs, Qs, bs, Hs, Rs, cs = map(jnp.asarray, params)
    ysj = jnp.asarray(ys)

    m0u, P0u, _ = F.kalman_update(ysj[0], m0, P0, Hs[0], cs[0], Rs[0])
    elems = F._make_associative_elements(Fs, Qs, bs, Hs[1:], Rs[1:], cs[1:],
                                         ysj[1:], m0u, P0u)
    # 63 elements: T not divisible by the 8 shards exercises pad-and-crop.
    want = jax.lax.associative_scan(F.filtering_operator, elems)
    got = sharded_filtering_scan(tmesh, elems)
    for w, g, n in zip(want, got, "AbCeJ"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-8,
                                   atol=1e-10, err_msg=n)


def test_sampling_reverse_scan(tmesh):
    from aux_ssm_tpu.ops.sampling import sampling_operator

    T, dx = 64, 3
    rng = np.random.default_rng(1)
    gains = jnp.asarray(0.3 * rng.standard_normal((T, dx, dx)))
    incs = jnp.asarray(rng.standard_normal((T, dx)))

    want = jax.lax.associative_scan(sampling_operator, (gains, incs), reverse=True)
    got = sharded_sampling_scan(tmesh, (gains, incs))
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]), rtol=1e-9)
