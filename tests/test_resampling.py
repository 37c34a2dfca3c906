import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aux_ssm_tpu.ops.resampling import multinomial, systematic, get


def _weights(rng, n):
    w = rng.uniform(size=n)
    return w / w.sum()


@pytest.mark.parametrize("scheme", [multinomial, systematic])
def test_index_zero_pinned(scheme):
    rng = np.random.default_rng(0)
    w = jnp.asarray(_weights(rng, 16))
    for s in range(50):
        idx = scheme(jax.random.key(s), w)
        assert idx[0] == 0
        assert idx.shape == (16,)
        assert (idx >= 0).all() and (idx <= 15).all()


def test_multinomial_marginal_frequencies():
    """Positions 1..N-1 of conditional multinomial are iid categorical(w)."""
    rng = np.random.default_rng(1)
    N = 8
    w = jnp.asarray(_weights(rng, N))
    keys = jax.random.split(jax.random.key(3), 20_000)
    idx = jax.vmap(lambda k: multinomial(k, w))(keys)
    counts = np.bincount(np.asarray(idx[:, 1:]).ravel(), minlength=N)
    freqs = counts / counts.sum()
    np.testing.assert_allclose(freqs, w, atol=0.01)


def test_systematic_count_property():
    """Systematic resampling (conditional or not) keeps per-index counts
    within 1 of N * w_i for every single draw — the low-variance guarantee."""
    rng = np.random.default_rng(2)
    N = 16
    w = _weights(rng, N)
    for s in range(200):
        idx = np.asarray(systematic(jax.random.key(s), jnp.asarray(w)))
        counts = np.bincount(idx, minlength=N)
        assert np.all(np.abs(counts - N * w) <= 1.0 + 1e-9)


def test_systematic_oracle():
    """Index-for-index check against a NumPy transcription of Chopin & Singh
    Algorithm 4 (oracle style as reference test_resamplings.py:47-78)."""
    rng = np.random.default_rng(5)
    N = 10
    w = _weights(rng, N)

    for s in range(20):
        key = jax.random.key(s)
        U, V, W = np.asarray(jax.random.uniform(key, (3,)))

        tmp = N * w[0]
        tmp_floor = np.floor(tmp)
        if tmp <= 1:
            u = tmp * U
        else:
            rem = tmp - tmp_floor
            p_cond = rem * (tmp_floor + 1) / tmp
            u = rem * U if V < p_cond else rem + (1 - rem) * U

        lin = (np.arange(N) + u) / N
        idx = np.searchsorted(np.cumsum(w), lin)
        n_zero = (idx == 0).sum()
        zero_loc = np.flatnonzero(idx == 0)
        if n_zero != 1:
            roll = int(np.floor(n_zero * W))
            idx = np.roll(idx, -zero_loc[roll])
        idx = np.clip(idx, 0, N - 1)

        got = systematic(key, jnp.asarray(w))
        np.testing.assert_array_equal(np.asarray(got), idx)


def test_get_lookup():
    assert get("multinomial") is multinomial
    assert get("systematic") is systematic
    with pytest.raises(ValueError):
        get("stratified")
