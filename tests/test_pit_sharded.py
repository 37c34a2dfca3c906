"""Cross-chip (time-sharded) PIT-cSMC vs the single-device engine: the
sharded kernel gathers boundary values instead of recomputing them, so with
identical keys the draws must match the single-device kernel exactly."""
import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.scipy.stats import norm

from aux_ssm_tpu.kernels import pit, pit_sharded
from aux_ssm_tpu.kernels.csmc_base import (
    UnivariatePotential, Potential, diag_gaussian_pair_factors)
from aux_ssm_tpu.kernels.csmc_independent import DiagonalGaussian
from aux_ssm_tpu.parallel.mesh import make_mesh
from aux_ssm_tpu.parallel.time_scan import TIME


@chex.dataclass
class G0(UnivariatePotential):
    def __call__(self, x):
        return jnp.sum(norm.logpdf(x), -1)


@chex.dataclass
class GenericGt(Potential):
    def __call__(self, x_next, x_t, y):
        return (jnp.sum(norm.logpdf(x_next, 0.9 * x_t, 0.5), -1)
                + jnp.sum(norm.logpdf(y, x_next, 0.4), -1))


@chex.dataclass
class FactorGt(Potential):
    """Same law, pair-factorisable (routes through the fused stitching)."""
    supports_pairwise_factors = True

    def __call__(self, x_next, x_t, y):
        return (jnp.sum(norm.logpdf(x_next, 0.9 * x_t, 0.5), -1)
                + jnp.sum(norm.logpdf(y, x_next, 0.4), -1))

    def pairwise_factors(self, x_left, x_right, y):
        rf, cf, rb, cb = diag_gaussian_pair_factors(0.9 * x_left, x_right, 0.5)
        cb = cb + jnp.sum(norm.logpdf(y, x_right, 0.4), -1)
        return rf, cf, rb, cb


def _setup(T, D, N, gt_cls, seed=0):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
    scale = jnp.full((T,), 0.7, jnp.float32)
    Mt = DiagonalGaussian(loc=u, scale=scale)
    ys = jnp.asarray(rng.standard_normal((T - 1, D)) * 0.5, jnp.float32)
    Gt = gt_cls(params=ys)
    return Mt, G0(), Gt


@pytest.mark.parametrize("gt_cls", [GenericGt, FactorGt])
@pytest.mark.parametrize("T,N", [(32, 16), (64, 8)])
def test_sharded_matches_single_device(gt_cls, T, N):
    D = 1
    Mt, g0, Gt = _setup(T, D, N, gt_cls)
    mesh = make_mesh(axis_names=(TIME,))
    assert mesh.shape[TIME] == 8

    init_s, kern_s = pit_sharded.get_sharded_kernel(Mt, g0, Gt, N, mesh)
    init_1, kern_1 = pit.get_kernel(Mt, g0, Gt, N)

    x0 = jnp.zeros((T, D), jnp.float32)
    key = jax.random.key(42)
    out_s = jax.jit(kern_s)(key, init_s(x0))
    out_1 = jax.jit(kern_1)(key, init_1(x0))

    np.testing.assert_array_equal(np.asarray(out_s.updated),
                                  np.asarray(out_1.updated))
    np.testing.assert_allclose(np.asarray(out_s.x), np.asarray(out_1.x),
                               rtol=1e-6, atol=1e-6)


def test_sharded_chain_runs_and_updates():
    T, D, N = 64, 1, 32
    Mt, g0, Gt = _setup(T, D, N, FactorGt, seed=3)
    mesh = make_mesh(axis_names=(TIME,))
    init_s, kern_s = pit_sharded.get_sharded_kernel(Mt, g0, Gt, N, mesh)

    def body(st, k):
        st = kern_s(k, st)
        return st, st.updated

    st = init_s(jnp.zeros((T, D), jnp.float32))
    _, upd = jax.jit(lambda s, ks: jax.lax.scan(body, s, ks))(
        st, jax.random.split(jax.random.key(0), 50))
    assert float(np.asarray(upd).mean()) > 0.5


def test_shape_validation():
    # 8 devices, T=24 -> T/C=3 is not a power of two.
    Mt, g0, Gt = _setup(24, 1, 8, GenericGt)
    mesh = make_mesh(axis_names=(TIME,))
    init_s, _ = pit_sharded.get_sharded_kernel(Mt, g0, Gt, 8, mesh)
    with pytest.raises(ValueError):
        init_s(jnp.zeros((24, 1)))


@pytest.mark.parametrize("S,N,T", [(4, 512, 8), (2, 256, 12)])
def test_particle_sharded_matches_single_device(S, N, T, monkeypatch):
    """The column-sharded block-mass stitching must be bit-identical to the
    single-device engine with blocked stitching under the per-block-max
    stabiliser (each 128-column block's log-mass then depends only on that
    block's columns; draws run replicated on the all-gathered masses with
    the same counter stream)."""
    import jax.sharding as shd
    from aux_ssm_tpu.parallel.mesh import PARTICLES

    monkeypatch.setenv("AUX_SSM_STITCH", "blocked")
    monkeypatch.setenv("AUX_SSM_BLOCK_MAX", "block")
    D = 1
    Mt, g0, Gt = _setup(T, D, N, FactorGt, seed=S)
    mesh = shd.Mesh(np.asarray(jax.devices()[:S]), (PARTICLES,))

    init_p, kern_p = pit_sharded.get_particle_sharded_kernel(Mt, g0, Gt, N,
                                                             mesh)
    init_1, kern_1 = pit.get_kernel(Mt, g0, Gt, N)

    x0 = jnp.zeros((T, D), jnp.float32)
    key = jax.random.key(23)
    out_p = jax.jit(kern_p)(key, init_p(x0))
    out_1 = jax.jit(kern_1)(key, init_1(x0))

    np.testing.assert_array_equal(np.asarray(out_p.updated),
                                  np.asarray(out_1.updated))
    np.testing.assert_array_equal(np.asarray(out_p.x), np.asarray(out_1.x))


def test_particle_sharded_validation():
    import jax.sharding as shd
    from aux_ssm_tpu.parallel.mesh import PARTICLES

    Mt, g0, Gt = _setup(8, 1, 64, FactorGt)
    mesh = shd.Mesh(np.asarray(jax.devices()[:4]), (PARTICLES,))
    with pytest.raises(ValueError):     # N/S = 16, not a multiple of 128
        pit_sharded.get_particle_sharded_kernel(Mt, g0, Gt, 64, mesh)
    Mt, g0, Gt2 = _setup(8, 1, 512, GenericGt)
    with pytest.raises(ValueError):     # no pairwise factors
        pit_sharded.get_particle_sharded_kernel(Mt, g0, Gt2, 512, mesh)


@pytest.mark.parametrize("gt_cls", [GenericGt, FactorGt])
@pytest.mark.parametrize("C,Tc,N", [(3, 8, 16), (6, 4, 8)])
def test_non_pow2_chunk_count_matches_single_device(gt_cls, C, Tc, N):
    """C need not be a power of two — only the chunk length T/C must be.
    The C-leaf boundary super-tree rides run_stitch_tree's prefix-active
    padding, reproducing the global tree's upper levels bit-for-bit."""
    import jax.sharding as shd
    T, D = C * Tc, 1
    Mt, g0, Gt = _setup(T, D, N, gt_cls, seed=C)
    mesh = shd.Mesh(np.asarray(jax.devices()[:C]), (TIME,))

    init_s, kern_s = pit_sharded.get_sharded_kernel(Mt, g0, Gt, N, mesh)
    init_1, kern_1 = pit.get_kernel(Mt, g0, Gt, N)

    x0 = jnp.zeros((T, D), jnp.float32)
    key = jax.random.key(11)
    out_s = jax.jit(kern_s)(key, init_s(x0))
    out_1 = jax.jit(kern_1)(key, init_1(x0))

    np.testing.assert_array_equal(np.asarray(out_s.updated),
                                  np.asarray(out_1.updated))
    np.testing.assert_allclose(np.asarray(out_s.x), np.asarray(out_1.x),
                               rtol=1e-6, atol=1e-6)


def test_single_device_mesh_falls_back():
    """A 1-device time mesh must delegate to the single-device kernel (the
    boundary super-tree over S=1 chunks is empty — regression: used to crash
    unpacking a None root)."""
    import jax.sharding as shd
    T, D, N = 16, 1, 8
    Mt, g0, Gt = _setup(T, D, N, FactorGt)
    mesh1 = shd.Mesh(np.asarray(jax.devices()[:1]), (TIME,))
    init_s, kern_s = pit_sharded.get_sharded_kernel(Mt, g0, Gt, N, mesh1)
    init_1, kern_1 = pit.get_kernel(Mt, g0, Gt, N)
    x0 = jnp.zeros((T, D), jnp.float32)
    key = jax.random.key(7)
    out_s = jax.jit(kern_s)(key, init_s(x0))
    out_1 = jax.jit(kern_1)(key, init_1(x0))
    np.testing.assert_array_equal(np.asarray(out_s.x), np.asarray(out_1.x))
