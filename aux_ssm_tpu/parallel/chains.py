"""Chain-parallel execution: many independent MCMC chains sharded over the
`chains` mesh axis.

The reference fakes this with `xla_force_host_platform_device_count` + vmap
on CPU (`examples/rare_event/experiment.py:21,189-196`). Here it is a
first-class path: the per-chain kernel is vmapped, chain-indexed PRNG keys
are derived with `fold_in` (so results are bitwise independent of the mesh
layout — SURVEY hard-part 6), all chain-local state (trajectory, delta,
online stats) carries the leading chain axis sharded with NamedSharding, and
cross-chain reductions (aggregate acceptance, pooled moments) are ordinary
jnp means that GSPMD lowers to psum over ICI.
"""
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import CHAINS
from ..experiments.runner import RunConfig, _phase_segment
from ..utils.stats import init_stats


def _whole_phase(kernel, n_iter, adapt, collect, cfg, get_stats_x):
    """One full (unsegmented) phase as a vmappable function of
    (key, state, delta)."""
    seg = _phase_segment(kernel, n_iter, adapt, collect, cfg, get_stats_x,
                         n_iter)

    def fn(key, state, delta):
        stats = init_stats(get_stats_x(state),
                           accept_shape=jnp.shape(state.updated))
        state, delta, stats, xs = seg(key, state, delta, stats, jnp.int32(0))
        if collect:
            return state, delta, stats, xs
        return state, delta, stats

    return fn


def shard_chains(mesh, tree):
    """Place every leaf's leading (chain) axis on the `chains` mesh axis."""
    sharding = NamedSharding(mesh, P(CHAINS))
    return jax.tree.map(lambda z: jax.device_put(z, sharding), tree)


def chain_keys(key, n_chains):
    """Mesh-layout-independent per-chain keys via fold_in."""
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n_chains))


def run_sharded_chains(key, kernel: Callable, init_states, cfg: RunConfig,
                       mesh=None, collect_samples: bool = False,
                       get_stats_x: Callable = lambda s: s.x,
                       delta_init=None):
    """Run `n_chains` independent chains (leading axis of `init_states`)
    through burn-in + sampling, sharded over `mesh`'s chains axis.

    Returns (states, stats, deltas, samples|None); every output keeps the
    leading chain axis. Aggregate with `aggregate_chain_stats`.
    """
    n_chains = jax.tree.leaves(get_stats_x(init_states))[0].shape[0]
    keys = chain_keys(key, n_chains)
    burn_keys = jax.vmap(lambda k: jax.random.fold_in(k, 0))(keys)
    sample_keys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)

    if delta_init is None:
        delta_init = jnp.full((n_chains,), cfg.delta_init)
    deltas = jnp.asarray(delta_init)

    if mesh is not None:
        init_states = shard_chains(mesh, init_states)
        deltas = shard_chains(mesh, deltas)
        burn_keys = shard_chains(mesh, burn_keys)
        sample_keys = shard_chains(mesh, sample_keys)

    burn = jax.jit(jax.vmap(
        _whole_phase(kernel, max(cfg.burnin, 1), True, False, cfg, get_stats_x)))
    states, deltas, _ = burn(burn_keys, init_states, deltas)

    if collect_samples:
        sample = jax.jit(jax.vmap(
            _whole_phase(kernel, cfg.n_samples, False, True, cfg, get_stats_x)))
        states, deltas, stats, samples = sample(sample_keys, states, deltas)
    else:
        sample = jax.jit(jax.vmap(
            _whole_phase(kernel, cfg.n_samples, False, False, cfg, get_stats_x)))
        states, deltas, stats = sample(sample_keys, states, deltas)
        samples = None
    return states, stats, deltas, samples


def aggregate_chain_stats(stats):
    """Cross-chain means of the online statistics (GSPMD lowers the reduction
    over the sharded chain axis to a psum across chips)."""
    return jax.tree.map(lambda z: jnp.mean(z, axis=0), stats)
