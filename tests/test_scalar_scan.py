"""Fused scalar block-scans (batched (T, B, 1, 1) layout) vs the XLA
associative-scan path, and the scalar fast paths of the combine operators."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aux_ssm_tpu.ops.filtering import filtering_operator
from aux_ssm_tpu.ops.sampling import sampling_operator
from aux_ssm_tpu.ops.pallas.scalar_scan import (
    fused_scalar_filter_scan, fused_scalar_affine_scan)


def _rand_filter_elems(rng, T, B):
    A = jnp.asarray(rng.uniform(0.5, 1.0, (T, B)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((T, B)), jnp.float32)
    C = jnp.asarray(rng.uniform(0.1, 1.0, (T, B)), jnp.float32)
    e = jnp.asarray(rng.standard_normal((T, B)), jnp.float32)
    J = jnp.asarray(rng.uniform(0.0, 0.5, (T, B)), jnp.float32)
    return A, b, C, e, J


def _as_mat(elems):
    A, b, C, e, J = elems
    return (A[..., None, None], b[..., None], C[..., None, None],
            e[..., None], J[..., None, None])


@pytest.mark.parametrize("T,B", [(64, 16), (100, 36), (1024, 64), (513, 130)])
def test_filter_scan_matches_xla(T, B):
    rng = np.random.default_rng(T + B)
    elems = _rand_filter_elems(rng, T, B)
    out = fused_scalar_filter_scan(elems, interpret=True)
    ref = jax.lax.associative_scan(filtering_operator, _as_mat(elems))
    for got, want in zip(out, ref):
        want = want.reshape(want.shape[:2])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("T,B", [(64, 16), (100, 36), (513, 130)])
@pytest.mark.parametrize("reverse", [False, True])
def test_affine_scan_matches_xla(T, B, reverse):
    rng = np.random.default_rng(3 * T + B)
    g = jnp.asarray(rng.uniform(-0.9, 0.9, (T, B)), jnp.float32)
    e = jnp.asarray(rng.standard_normal((T, B)), jnp.float32)
    og, oe = fused_scalar_affine_scan(g, e, reverse=reverse, interpret=True)
    rg, re = jax.lax.associative_scan(
        sampling_operator, (g[..., None, None], e[..., None]), reverse=reverse)
    np.testing.assert_allclose(np.asarray(og), np.asarray(rg)[..., 0, 0],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(oe), np.asarray(re)[..., 0],
                               rtol=2e-5, atol=2e-5)


def test_scalar_operator_fast_path_matches_generic():
    """The dx==1 elementwise branch must agree with the generic matrix
    algebra (run by building 1x1 elements and comparing against a 2x2
    block-diagonal embedding collapsed back to scalars)."""
    rng = np.random.default_rng(0)
    T, B = 17, 5
    e1 = _as_mat(_rand_filter_elems(rng, T, B))
    e2 = _as_mat(_rand_filter_elems(rng, T, B))

    got = filtering_operator(e1, e2)

    def embed(z):
        if z.shape[-1] == 1 and z.ndim >= 2 and z.shape[-2] == 1:
            out = jnp.zeros(z.shape[:-2] + (2, 2), z.dtype)
            out = out.at[..., 0, 0].set(z[..., 0, 0])
            out = out.at[..., 1, 1].set(z[..., 0, 0])
            return out
        out = jnp.zeros(z.shape[:-1] + (2,), z.dtype)
        return out.at[..., 0].set(z[..., 0])

    big = filtering_operator(tuple(map(embed, e1)), tuple(map(embed, e2)))
    for g, w in zip(got, big):
        if g.shape[-1] == 1 and g.ndim >= 2 and g.shape[-2] == 1:
            np.testing.assert_allclose(np.asarray(g[..., 0, 0]),
                                       np.asarray(w[..., 0, 0]), rtol=1e-5)
        else:
            np.testing.assert_allclose(np.asarray(g[..., 0]),
                                       np.asarray(w[..., 0]), rtol=1e-5)


def test_chunked_scalar_scan_small_T_matches_xla():
    """The work-efficient chunked scalar kernel (default at T >= 512; called
    directly here because the jitted entry caches the env-selected mode per
    shape) must also be exact on small padded shapes."""
    from aux_ssm_tpu.ops.pallas.scalar_scan import (
        _chunked_block_scan, _filter_combine, _FILTER_IDENT)
    rng = np.random.default_rng(7)
    for (T, B) in [(30, 5), (100, 36), (513, 130)]:
        elems = list(_rand_filter_elems(rng, T, B))
        got = _chunked_block_scan(elems, _filter_combine, _FILTER_IDENT,
                                  interpret=True)
        ref = jax.lax.associative_scan(filtering_operator,
                                       _as_mat(tuple(elems)))
        for g, want in zip(got, ref):
            want = want.reshape(want.shape[:2])
            np.testing.assert_allclose(np.asarray(g), np.asarray(want),
                                       rtol=2e-5, atol=2e-5)
