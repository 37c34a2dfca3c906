"""Parallel-in-time conditional SMC (divide-and-conquer particle Gibbs).

Capability parity with `_primitives/csmc/pit/` (dc_map.py:37-159,
operator.py:38-149, csmc.py:16-114) — independent, TPU-first implementation.

Structure
---------
- `dc_map`: a log2(T)-level binary tree reduction. T is padded to the next
  power of two; at every level the number of "active" pairs is a *Python*
  constant, so the active/passthrough split is a static slice (the reference
  uses NumPy boolean masks, `pit/dc_map.py:91-121`; static slices express the
  same thing with zero gather traffic and keep every level fully jittable and
  shardable).
- `stitching_operator`: combines two partial smoothers by drawing N index
  pairs from the N^2 boundary-weight categorical (conditional multinomial,
  pair 0 pinned), then gathering and concatenating the trajectory blocks.
- `get_kernel`: the PIT-cSMC kernel over independent per-time proposals.

The N^2 weight matrix is the hot spot at scale (N=4096 -> 16M weights per
node); `ops/pallas/stitching.py` provides a fused Pallas path used
automatically for large N on TPU.
"""
import math

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from .csmc_base import CSMCState, Distribution, UnivariatePotential, Potential
from ..ops.resampling import multinomial


# --------------------------------------------------------------------------
# Generic divide-and-conquer tree map
# --------------------------------------------------------------------------

def _next_pow2(n):
    return 1 << (n - 1).bit_length()


def _pad_leaf(z, pow2, T):
    pad = [(0, pow2 - T)] + [(0, 0)] * (z.ndim - 1)
    if jnp.issubdtype(z.dtype, jnp.integer) or jnp.issubdtype(z.dtype, jnp.bool_):
        return jnp.pad(z, pad, constant_values=0)
    if jnp.issubdtype(z.dtype, jax.dtypes.prng_key):
        return jnp.pad(z, pad, mode="edge")  # never consumed
    return jnp.pad(z, pad, constant_values=jnp.nan)


def dc_map(elems, operator, last_operator=None):
    """Binary-tree reduction of `elems` (leading axis T) with `operator`.

    `operator(pair_a, pair_b)` receives pytrees whose leaves have shape
    (n_pairs, block, ...) and must return leaves of shape
    (n_pairs, 2*block, ...) — i.e. it is already vmapped over the pair axis
    (wrap with `jax.vmap` as the reference does, `pit/csmc.py:112`).
    `last_operator` (optional) is used for the root combination.
    """
    if last_operator is None:
        last_operator = operator

    leaves, treedef = jax.tree.flatten(elems)
    T = leaves[0].shape[0]
    if T <= 1:
        return elems  # nothing to combine
    pow2 = _next_pow2(T)
    K = int(math.log2(pow2))

    padded = jax.tree.map(lambda z: _pad_leaf(z, pow2, T), elems)

    tree = jax.tree.map(lambda z: z.reshape((pow2, 1) + z.shape[1:]), padded)

    for k in range(K):
        block = 1 << k
        n_pairs = pow2 // (2 * block)
        even = jax.tree.map(lambda z: z[0::2], tree)
        odd = jax.tree.map(lambda z: z[1::2], tree)

        # A pair is active iff its odd block contains at least one real index,
        # i.e. its start (2p+1)*2^k < T. Active pairs are a prefix.
        n_active = sum(1 for p in range(n_pairs) if (2 * p + 1) * block < T)

        if k == K - 1:
            tree = last_operator(even, odd)
        elif n_active == n_pairs:
            tree = operator(even, odd)
        else:
            act = operator(
                jax.tree.map(lambda z: z[:n_active], even),
                jax.tree.map(lambda z: z[:n_active], odd),
            )
            rest = jax.tree.map(
                lambda a, b: jnp.concatenate([a[n_active:], b[n_active:]], axis=1),
                even, odd,
            )
            tree = jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0), act, rest)

    return jax.tree.map(lambda z: z.reshape((pow2,) + z.shape[2:])[:T], tree)


# --------------------------------------------------------------------------
# Stitching operator
# --------------------------------------------------------------------------

def stitching_weights(x_left, log_w_left, x_right, log_w_right, params_right,
                      log_weight_fn):
    """Normalised (N, N) stitching weights across a block boundary:
    w_ij ∝ exp(G(x_right_j, x_left_i) + log_w_left_i + log_w_right_j)."""
    pairwise = jax.vmap(
        jax.vmap(log_weight_fn, in_axes=(None, 0, None)),
        in_axes=(0, None, None),
    )(x_left, x_right, params_right)
    log_w = pairwise + log_w_left[:, None] + log_w_right[None, :]
    return jnp.exp(log_w - logsumexp(log_w))


def stitching_operator(inputs_a, inputs_b, log_weight_fn, n_samples, last_step):
    """Combine two partial conditional smoothers (one tree node).

    `inputs_* = ((trajectories, log_weights, origins), keys, params)` with
    trajectories (t_block, N, d). Draws N boundary index pairs — conditional
    multinomial with pair 0 pinned so the reference trajectory survives — or a
    single unconditional pair at the root when `last_step`.
    """
    (traj_a, log_w_a, orig_a), keys_a, params_a = inputs_a
    (traj_b, log_w_b, orig_b), keys_b, params_b = inputs_b

    weights = stitching_weights(
        jax.tree.map(lambda z: z[-1], traj_a), log_w_a[-1],
        jax.tree.map(lambda z: z[0], traj_b), log_w_b[0],
        jax.tree.map(lambda z: z[0], params_b),
        log_weight_fn,
    )

    if last_step:
        idx = jax.random.choice(keys_b[0], n_samples * n_samples, p=weights.ravel())
        l_idx, r_idx = jnp.unravel_index(idx, (n_samples, n_samples))
    else:
        idx = multinomial(keys_b[0], weights.ravel(), n_samples)
        l_idx, r_idx = jax.vmap(jnp.unravel_index, in_axes=(0, None))(
            idx, (n_samples, n_samples)
        )

    traj_a = jax.tree.map(lambda z: jnp.take(z, l_idx, axis=1), traj_a)
    traj_b = jax.tree.map(lambda z: jnp.take(z, r_idx, axis=1), traj_b)
    orig_a = jnp.take(orig_a, l_idx, axis=1)
    orig_b = jnp.take(orig_b, r_idx, axis=1)

    cat = lambda a, b: jnp.concatenate([a, b], axis=0)
    traj = jax.tree.map(cat, traj_a, traj_b)
    origins = cat(orig_a, orig_b)
    keys = cat(keys_a, keys_b)
    params = jax.tree.map(cat, params_a, params_b)
    log_w = jnp.full_like(cat(log_w_a, log_w_b), -math.log(n_samples))
    return (traj, log_w, origins), keys, params


# --------------------------------------------------------------------------
# PIT-cSMC kernel
# --------------------------------------------------------------------------

def get_kernel(Mt: Distribution, G0: UnivariatePotential, Gt: Potential, N: int,
               Qt: Distribution = None):
    """Parallel-in-time cSMC kernel over independent per-time proposals.

    Targets (up to proportionality) prod_t Mt[t](x_t) G0(x_0) prod Gt — or,
    with `Qt` given, uses Mt as proposal for the Qt-weighted model (importance
    correction), as in reference `pit/csmc.py:16-54`.

    `Mt`/`Qt` are time-batched Distributions: `jax.vmap(lambda m, k:
    m.sample(k, N))(Mt, keys)` must yield (T, N, d).
    """

    def kernel(key, state):
        x, picked = _pit_csmc(key, state.x, Mt, G0, Gt, N, Qt)
        return CSMCState(x=x, updated=picked != 0)

    def init(x_star):
        T = x_star.shape[0]
        return CSMCState(x=x_star, updated=jnp.zeros((T,), dtype=bool))

    return init, kernel


def _pit_csmc(key, x_star, Mt, G0, Gt, N, Qt):
    T = x_star.shape[0]
    sample_key, resample_key = jax.random.split(key)
    sample_keys = jax.random.split(sample_key, T)
    resample_keys = jax.random.split(resample_key, T)

    # Propose all T x N particles at once — the fully time-parallel step.
    xs = jax.vmap(lambda m, k: m.sample(k, N))(Mt, sample_keys)
    xs = xs.at[:, 0].set(x_star)

    if Qt is not None:
        log_wts = jax.vmap(lambda q, x: q.logpdf(x))(Qt, xs)
        log_wts -= jax.vmap(lambda m, x: m.logpdf(x))(Mt, xs)
    else:
        log_wts = jnp.zeros((T, N), dtype=x_star.dtype)

    log_wts = log_wts.at[0].add(G0(xs[0]))
    log_wts -= logsumexp(log_wts, axis=1, keepdims=True)

    origins = jnp.tile(jnp.arange(N), (T, 1))

    # Shift Gt params one step right: params[t] weighs the (t-1, t) boundary.
    params = Gt.params
    fake = jax.tree.map(lambda z: jnp.full_like(z[:1], jnp.nan), params)
    params = jax.tree.map(lambda f, z: jnp.concatenate([f, z], axis=0), fake, params)

    def log_weight_fn(x_left, x_right, params_t):
        return Gt(x_right, x_left, params_t)

    op = jax.vmap(
        lambda a, b: stitching_operator(a, b, log_weight_fn, N, False)
    )
    last_op = jax.vmap(
        lambda a, b: stitching_operator(a, b, log_weight_fn, N, True)
    )

    inputs = ((xs, log_wts, origins), resample_keys, params)
    (xs_out, _, picked), *_ = dc_map(inputs, op, last_op)
    return xs_out, picked
