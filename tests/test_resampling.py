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


@pytest.mark.parametrize("scheme", [multinomial, systematic])
def test_index_zero_pinned_underflowed_reference(scheme):
    """Regression: the reference particle's weight can underflow to exactly
    0 in f32 (log-weight ~88 nats below the max); the conditional pin must
    survive the degenerate case."""
    w = np.zeros(16)
    w[1:] = 1.0 / 15
    w = jnp.asarray(w, jnp.float32)
    for s in range(50):
        idx = scheme(jax.random.key(s), w)
        assert idx[0] == 0


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
    """Index-for-index check against a NumPy transcription of the conditional
    offset law f(o) ∝ ceil(N*w0 - o) followed by rotation of a uniformly
    chosen copy of particle 0 into slot 0 (Chopin & Singh 2015, Alg. 4)."""
    rng = np.random.default_rng(5)
    N = 10
    w = _weights(rng, N)

    for s in range(20):
        key = jax.random.key(s)
        k_mix, k_off, k_rot = jax.random.split(key, 3)
        u_mix = float(jax.random.uniform(k_mix))
        u_off = float(jax.random.uniform(k_off))
        u_rot = float(jax.random.uniform(k_rot))

        c = N * w[0]
        frac = c - np.floor(c)
        if u_mix * c < frac * (np.floor(c) + 1.0):
            o = frac * u_off
        else:
            o = frac + (1.0 - frac) * u_off

        idx = np.searchsorted(np.cumsum(w), (np.arange(N) + o) / N)
        n0 = int((idx == 0).sum())
        idx = np.roll(idx, -int(np.floor(n0 * u_rot)))
        idx = np.clip(idx, 0, N - 1)

        got = systematic(key, jnp.asarray(w))
        np.testing.assert_array_equal(np.asarray(got), idx)


def test_systematic_conditional_law():
    """Distribution-level check: the conditional scheme must match the law of
    plain systematic resampling conditioned on a *uniformly chosen slot*
    holding particle 0 (size-biased by the copy count — that is what tilts
    the offset density to ∝ ceil(N w0 − o)), with that slot rotated to the
    front. Obtained here by NumPy rejection sampling."""
    rng = np.random.default_rng(7)
    N = 8
    w = _weights(rng, N)
    cum = np.cumsum(w)

    n_trials = 6_000
    ref_counts = np.zeros((N, N))  # slot x index frequencies
    got_trials = 0
    while got_trials < n_trials:
        o = rng.uniform()
        idx = np.searchsorted(cum, (np.arange(N) + o) / N)
        slot = rng.integers(N)
        if idx[slot] != 0:
            continue
        idx = np.roll(idx, -slot)
        idx = np.clip(idx, 0, N - 1)
        ref_counts[np.arange(N), idx] += 1
        got_trials += 1

    keys = jax.random.split(jax.random.key(11), n_trials)
    got = np.asarray(jax.vmap(lambda k: systematic(k, jnp.asarray(w)))(keys))
    got_counts = np.zeros((N, N))
    for slot in range(N):
        got_counts[slot] = np.bincount(got[:, slot], minlength=N)

    np.testing.assert_allclose(
        got_counts / n_trials, ref_counts / n_trials, atol=0.03
    )


def test_get_lookup():
    assert get("multinomial") is multinomial
    assert get("systematic") is systematic
    with pytest.raises(ValueError):
        get("stratified")
