"""Collective conditional resampling over a sharded particle axis.

SURVEY hard-part 2: multinomial/systematic resampling over particles sharded
across chips must preserve the pinned-index-0 conditional property and exact
key reproducibility. Strategy: the categorical draw happens on *replicated*
all-gathered weights (N floats — bytes on the wire), so every shard computes
the identical index vector from the identical key; the particle gather is
resolved by all-gathering particles and slicing the local output range.
All-gather of weights+particles rides ICI and is cheap next to the per-step
model math at the N this framework targets (<= 64k particles).
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from .mesh import PARTICLES
from ..ops.resampling import multinomial


def sharded_conditional_resample(mesh, key, weights, particles, scheme=multinomial,
                                 axis=PARTICLES):
    """Resample `particles` (N, ...) sharded over `axis` according to global
    `weights` (N,), keeping global index 0 pinned at global position 0.

    Returns resampled particles with the same sharding. Bitwise identical to
    the single-chip `scheme(key, weights)` + take.
    """
    n_shards = mesh.shape[axis]

    def body(w_local, p_local):
        w = jax.lax.all_gather(w_local, axis, tiled=True)
        idx = scheme(key, w)                      # identical on every shard
        shard = jax.lax.axis_index(axis)
        local_n = w_local.shape[0]
        my_idx = jax.lax.dynamic_slice_in_dim(idx, shard * local_n, local_n)
        p = jax.lax.all_gather(p_local, axis, tiled=True)
        return jnp.take(p, my_idx, axis=0)

    spec = P(axis)
    return shard_map(
        body, mesh=mesh,
        in_specs=(spec, spec),
        out_specs=spec,
    )(weights, particles)


def sharded_normalize(mesh, log_weights, axis=PARTICLES):
    """Exp-normalise log-weights sharded over `axis` (global logsumexp via
    pmax + psum)."""

    def body(lw):
        m = jax.lax.pmax(jnp.max(lw), axis)
        s = jax.lax.psum(jnp.sum(jnp.exp(lw - m)), axis)
        return jnp.exp(lw - m) / s

    return shard_map(body, mesh=mesh, in_specs=P(axis), out_specs=P(axis))(log_weights)
