"""TPU-fast gather/draw primitives: the tile path must be exactly equal to
the take_along_axis / flat inverse-CDF semantics (forced on CPU via
AUX_SSM_FAST_TAKE=1)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aux_ssm_tpu.ops import take as tk


@pytest.fixture
def force_tile(monkeypatch):
    monkeypatch.setenv("AUX_SSM_FAST_TAKE", "1")


def test_take_rows_scalar_valued_exact(force_tile):
    rng = np.random.default_rng(0)
    P, N, n = 3, 256, 100
    vals = jnp.asarray(rng.standard_normal((P, N)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, (P, n)), jnp.int32)
    got = tk.take_rows(vals, idx)
    want = jnp.take_along_axis(vals, idx, axis=-1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_take_rows_vector_valued_exact(force_tile):
    rng = np.random.default_rng(1)
    P, N, n, d = 2, 384, 50, 3
    vals = jnp.asarray(rng.standard_normal((P, N, d)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, (P, n)), jnp.int32)
    got = tk.take_rows(vals, idx)
    want = jnp.take_along_axis(vals, idx[..., None], axis=-2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_take_rows_int_dtype(force_tile):
    rng = np.random.default_rng(2)
    P, N = 4, 128
    vals = jnp.asarray(rng.integers(0, 1000, (P, N)), jnp.int32)
    idx = jnp.asarray(rng.integers(0, N, (P, N)), jnp.int32)
    got = tk.take_rows(vals, idx)
    want = jnp.take_along_axis(vals, idx, axis=-1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_take_rows_large_int_values_exact(force_tile):
    """int32 payloads with values past 2^24 must survive take_rows exactly:
    without the index_payload promise the f32 one-hot round-trip may not be
    used (16_777_217 would silently become 16_777_216)."""
    rng = np.random.default_rng(9)
    P, N = 2, 128
    vals = jnp.asarray(
        rng.integers(2 ** 24, 2 ** 30, (P, N)), jnp.int32
    ).at[0, 0].set(16_777_217)
    idx = jnp.asarray(rng.integers(0, N, (P, N)), jnp.int32).at[0, 0].set(0)
    got = tk.take_rows(vals, idx)
    want = jnp.take_along_axis(vals, idx, axis=-1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # The promise path stays exact for genuine index payloads (< 2^24).
    small = jnp.asarray(rng.integers(0, N, (P, N)), jnp.int32)
    got2 = tk.take_rows(small, idx, index_payload=True)
    np.testing.assert_array_equal(
        np.asarray(got2), np.asarray(jnp.take_along_axis(small, idx, axis=-1)))


def test_take_rows_non_tile_aligned_falls_back(force_tile):
    rng = np.random.default_rng(3)
    vals = jnp.asarray(rng.standard_normal((2, 100)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 100, (2, 10)), jnp.int32)
    got = tk.take_rows(vals, idx)
    want = jnp.take_along_axis(vals, idx, axis=-1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_categorical_tile_matches_flat(force_tile):
    """Tile-hierarchical inverse CDF must make the same draws as the flat
    inverse CDF (identical uniforms); f32 association can flip a draw only
    on an exact CDF boundary, which has measure ~0 for random logits."""
    rng = np.random.default_rng(4)
    P, N, n = 5, 512, 300
    logits = jnp.asarray(rng.standard_normal((P, N)), jnp.float32)
    u = jnp.asarray(rng.uniform(size=(P, n)), jnp.float32)
    got = tk.categorical_from_uniforms(logits, u)
    want = tk._flat_inverse_cdf(logits, u)
    assert float((np.asarray(got) == np.asarray(want)).mean()) > 0.999


def test_categorical_law(force_tile):
    """Empirical frequencies match softmax probabilities."""
    rng = np.random.default_rng(5)
    N, n = 128, 200_000
    logits = jnp.asarray(rng.standard_normal(N), jnp.float32)
    u = jnp.asarray(rng.uniform(size=(n,)), jnp.float32)
    idx = np.asarray(tk.categorical_from_uniforms(logits, u))
    p = np.exp(np.asarray(logits) - np.asarray(logits).max())
    p /= p.sum()
    freq = np.bincount(idx, minlength=N) / n
    np.testing.assert_allclose(freq.reshape(8, -1).sum(1),
                               p.reshape(8, -1).sum(1),
                               atol=5 * 0.5 / np.sqrt(n))


def test_categorical_three_level_matches_flat(force_tile):
    """N > TILE^2 routes through the super-tile level; same draws as the
    flat inverse CDF up to f32 boundary ties."""
    rng = np.random.default_rng(6)
    P, N, n = 2, 128 * 128 * 2, 500
    logits = jnp.asarray(rng.standard_normal((P, N)), jnp.float32)
    u = jnp.asarray(rng.uniform(size=(P, n)), jnp.float32)
    got = tk.categorical_from_uniforms(logits, u)
    want = tk._flat_inverse_cdf(logits, u)
    assert float((np.asarray(got) == np.asarray(want)).mean()) > 0.999


def test_categorical_three_level_padded_tiles(force_tile):
    """Tile counts that are not a multiple of TILE pad with zero-mass
    super-tile slots; u -> 1 must still return a valid index."""
    rng = np.random.default_rng(7)
    N = 128 * 130                      # nb = 130 -> ns = 2 with 126 padded
    logits = jnp.asarray(rng.standard_normal((N,)), jnp.float32)
    u = jnp.asarray([1e-7, 0.5, 1.0 - 1e-7], jnp.float32)
    idx = np.asarray(tk.categorical_from_uniforms(logits, u))
    assert (idx >= 0).all() and (idx < N).all()
    want = np.asarray(tk._flat_inverse_cdf(logits, u))
    np.testing.assert_array_equal(idx, want)


def test_categorical_three_level_law(force_tile):
    """Empirical coarse-bin frequencies match softmax over N = 3 * 128^2."""
    rng = np.random.default_rng(8)
    N, n = 128 * 128 * 3, 100_000
    logits = jnp.asarray(rng.standard_normal(N), jnp.float32)
    u = jnp.asarray(rng.uniform(size=(n,)), jnp.float32)
    idx = np.asarray(tk.categorical_from_uniforms(logits, u))
    p = np.exp(np.asarray(logits, np.float64))
    p /= p.sum()
    freq = np.bincount(idx, minlength=N) / n
    np.testing.assert_allclose(freq.reshape(8, -1).sum(1),
                               p.reshape(8, -1).sum(1),
                               atol=5 * 0.5 / np.sqrt(n))


def test_categorical_1d(force_tile):
    logits = jnp.asarray(np.log([0.1, 0.2, 0.3, 0.4] * 32), jnp.float32)
    u = jnp.asarray([0.0001, 0.5, 0.9999], jnp.float32)
    idx = tk.categorical_from_uniforms(logits, u)
    assert idx.shape == (3,)
    assert int(idx[0]) == 0 and int(idx[2]) == 127


def test_select_tile_rows_bf16_planes_bitexact(force_tile, monkeypatch):
    """The 3-plane bf16 one-hot selection (opt-in path) must reproduce f32
    rows BIT-exactly (hi/mid/lo are disjoint exact mantissa windows; the one-hot
    contraction touches one row per output). Mixed magnitudes + negatives +
    the -1e30 neg-floor stress the split."""
    monkeypatch.setenv("AUX_SSM_PLANE_SELECT", "1")
    rng = np.random.default_rng(42)
    P, R, C, n = 3, 64, 17, 41
    vals = rng.standard_normal((P, R, C)) * np.exp(
        rng.uniform(-30, 30, size=(P, R, C)))
    vals[0, 0, 0] = -1e30
    vals[1, 2, 3] = 0.0
    vals[2, 5, :] = 1.0 + np.finfo(np.float32).eps
    mat = jnp.asarray(vals, jnp.float32)
    idx = jnp.asarray(rng.integers(0, R, size=(P, n)), jnp.int32)
    got = tk._select_tile_rows(mat, idx)
    want = jnp.take_along_axis(mat, idx[:, :, None], axis=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
