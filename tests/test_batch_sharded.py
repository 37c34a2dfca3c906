"""Cross-chip batch/component parallelism (P5): the batched (T, B, ...)
layout sharded over the `batch` mesh axis must reproduce the single-device
results — bitwise for sampling (no cross-B reductions touch the draws) and
to reduction-order tolerance for anything summing over B."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aux_ssm_tpu.ops.lgssm import LGSSM
from aux_ssm_tpu.ops.filtering import filtering
from aux_ssm_tpu.ops.sampling import sampling
from aux_ssm_tpu.parallel.mesh import make_mesh, BATCH
from aux_ssm_tpu.parallel.batch import (
    shard_batched_lgssm, shard_time_major, batch_sharded_kernel)

T, B = 32, 16


@pytest.fixture(scope="module")
def bmesh():
    return make_mesh(axis_names=(BATCH,))


@pytest.fixture(scope="module")
def batched_model():
    """B independent scalar AR(1) LGSSMs in the (T, B, 1, 1) layout."""
    rng = np.random.default_rng(0)
    phi = rng.uniform(0.5, 0.95, size=B)
    q = rng.uniform(0.2, 1.0, size=B)
    m0 = jnp.zeros((B, 1))
    P0 = jnp.asarray(q / (1 - phi ** 2))[:, None, None]
    Fs = jnp.tile(jnp.asarray(phi)[None, :, None, None], (T - 1, 1, 1, 1))
    Qs = jnp.tile(jnp.asarray(q)[None, :, None, None], (T - 1, 1, 1, 1))
    bs = jnp.zeros((T - 1, B, 1))
    Hs = jnp.ones((T, B, 1, 1))
    Rs = jnp.full((T, B, 1, 1), 0.5)
    cs = jnp.zeros((T, B, 1))
    lgssm = LGSSM(m0, P0, Fs, Qs, bs, Hs, Rs, cs)
    ys = jnp.asarray(rng.standard_normal((T, B, 1)))
    return lgssm, ys


@pytest.mark.parametrize("parallel", [False, True])
def test_batched_filter_sharded_matches(bmesh, batched_model, parallel):
    lgssm, ys = batched_model
    ms, Ps, ell = jax.jit(filtering, static_argnums=2)(ys, lgssm, parallel)

    lgssm_s = shard_batched_lgssm(bmesh, lgssm)
    ys_s = shard_time_major(bmesh, ys)
    ms_s, Ps_s, ell_s = jax.jit(filtering, static_argnums=2)(
        ys_s, lgssm_s, parallel)

    np.testing.assert_allclose(np.asarray(ms_s), np.asarray(ms), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(Ps_s), np.asarray(Ps), rtol=1e-12)
    # ell sums over B -> cross-chip psum may reorder the reduction.
    np.testing.assert_allclose(np.asarray(ell_s), np.asarray(ell), rtol=1e-12)


@pytest.mark.parametrize("parallel", [False, True])
def test_batched_sampling_sharded_bitwise(bmesh, batched_model, parallel):
    lgssm, ys = batched_model
    key = jax.random.key(5)
    ms, Ps, _ = filtering(ys, lgssm, parallel)

    want = jax.jit(sampling, static_argnums=4)(key, ms, Ps, lgssm, parallel)
    got = jax.jit(sampling, static_argnums=4)(
        key, shard_time_major(bmesh, ms), shard_time_major(bmesh, Ps),
        shard_batched_lgssm(bmesh, lgssm), parallel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12,
                               atol=1e-12)


def test_spatial_kernel_batch_sharded_step(bmesh):
    """One auxiliary-Kalman step of the spatial model (BASELINE config #4
    family) with B = D^2 sharded: same draws as the unsharded kernel."""
    from aux_ssm_tpu.models import spatial as sp

    D, Tl = 4, 16                       # B = 16 scalar filters
    rng = np.random.default_rng(3)
    _, ys_np = sp.get_data(rng, 0.3, 1.0, -0.25, 4.0, D, Tl)
    ys = jnp.asarray(ys_np)

    init, kernel = sp.get_kalman_kernel(ys, 0.3, 4.0, -0.25, 1.0, D,
                                        parallel=True, order=1)
    x0 = jnp.zeros((Tl, D * D, 1))
    key = jax.random.key(2)
    delta = jnp.asarray(0.05)

    state = init(x0)
    want = jax.jit(kernel)(key, state, delta)

    kernel_s = batch_sharded_kernel(kernel, bmesh)
    state_s = init(shard_time_major(bmesh, x0))
    got = jax.jit(kernel_s)(key, state_s, delta)

    np.testing.assert_allclose(np.asarray(got.x), np.asarray(want.x),
                               rtol=1e-9, atol=1e-9)
    assert bool(got.updated) == bool(want.updated)


def test_spatial_kernel_batch_sharded_chain(bmesh):
    """A short chain through lax.scan keeps the carry B-sharded and matches
    the unsharded chain."""
    from aux_ssm_tpu.models import spatial as sp

    D, Tl = 4, 16
    rng = np.random.default_rng(7)
    _, ys_np = sp.get_data(rng, 0.3, 1.0, -0.25, 4.0, D, Tl)
    ys = jnp.asarray(ys_np)
    init, kernel = sp.get_kalman_kernel(ys, 0.3, 4.0, -0.25, 1.0, D,
                                        parallel=True, order=1)
    kernel_s = batch_sharded_kernel(kernel, bmesh)
    delta = jnp.asarray(0.05)
    keys = jax.random.split(jax.random.key(9), 10)

    def run(kern, x0):
        def body(st, k):
            st = kern(k, st, delta)
            return st, st.updated
        st, upd = jax.lax.scan(body, init(x0), keys)
        return st.x, upd

    x0 = jnp.zeros((Tl, D * D, 1))
    want_x, want_u = jax.jit(lambda x: run(kernel, x))(x0)
    got_x, got_u = jax.jit(lambda x: run(kernel_s, x))(
        shard_time_major(bmesh, x0))

    np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(got_u), np.asarray(want_u))
