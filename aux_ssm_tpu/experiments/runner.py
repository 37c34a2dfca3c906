"""Generic MCMC experiment loop.

Capability parity with the reference drivers' `loop(...)` pattern
(`examples/stochastic_volatility/experiment.py:88-128,159-182`): burn-in with
delta adaptation (linearly decaying learning rate, acceptance-window EMA),
then a frozen-delta sampling phase with online EJSD/moment statistics.

TPU-first differences: one typed config instead of argparse; the whole loop
is a single `lax.scan` (jit-compiled once); timing uses host-side
`block_until_ready` around the dispatched scan rather than in-graph
io_callback pairs; progress printing via `jax.debug.callback` is optional.
All loop state is a pytree, so the same loop runs vmapped over chains and
sharded over a device mesh.
"""
import time
from dataclasses import dataclass
from typing import Any, Callable, Optional

import chex
import jax
import jax.numpy as jnp

from ..kernels.adaptation import delta_adaptation
from ..utils.stats import OnlineStats, init_stats, update_stats


@dataclass(frozen=True)
class RunConfig:
    """Schedule and adaptation configuration for one experiment run."""
    n_samples: int = 1000
    burnin: int = 100
    target_alpha: float = 0.5
    delta_init: float = 1e-2
    learning_rate: float = 0.1
    beta: float = 0.05          # acceptance EMA window rate
    min_delta: float = 1e-20
    max_delta: float = 1e20
    adapt_on_window: bool = True  # adapt on windowed (vs cumulative) rate
    verbose: bool = False
    print_every: int = 100


@chex.dataclass
class RunResult:
    """Outputs of `run_chain`."""
    state: Any              # final sampler state
    stats: OnlineStats      # sampling-phase online statistics
    delta: chex.Array       # final (adapted) delta
    samples: Optional[Any]  # stacked trajectories if requested
    sampling_time: float    # wall-clock seconds of the sampling phase


def _phase(kernel: Callable, n_iter: int, adapt: bool, cfg: RunConfig, get_stats_x):
    """Build a jitted scan over `n_iter` kernel steps. When `adapt`, delta is
    updated each step with a linearly decaying learning rate."""

    def one_step(carry, inp):
        i, key = inp
        state, delta, stats = carry
        x_prev = get_stats_x(state)
        new_state = kernel(key, state, delta)
        stats = update_stats(stats, x_prev, get_stats_x(new_state),
                             new_state.updated, beta=cfg.beta)
        if adapt:
            lr = cfg.learning_rate * (n_iter - i.astype(jnp.float32)) / n_iter
            rate = stats.accept_win if cfg.adapt_on_window else stats.accept_cum
            # A per-time-step acceptance vector adapts a (T,) delta
            # elementwise; a scalar delta adapts on the mean rate.
            if jnp.ndim(rate) > jnp.ndim(delta):
                rate = jnp.mean(rate)
            delta = delta_adaptation(delta, cfg.target_alpha, rate, lr,
                                     cfg.min_delta, cfg.max_delta)
        if cfg.verbose:
            def _report(step, dmin, dmax, aw, ac):
                if int(step) % cfg.print_every == 0:
                    print(f"    iter {int(step):>7d}  delta[{float(dmin):.3e},"
                          f"{float(dmax):.3e}]  acc_win {float(aw):.3f}  "
                          f"acc_cum {float(ac):.3f}", flush=True)
            jax.debug.callback(_report, i, jnp.min(delta), jnp.max(delta),
                               jnp.mean(stats.accept_win), jnp.mean(stats.accept_cum))
        return (new_state, delta, stats), None

    def scan_phase(key, state, delta):
        keys = jax.random.split(key, n_iter)
        stats = init_stats(get_stats_x(state), accept_shape=jnp.shape(state.updated))
        (state, delta, stats), _ = jax.lax.scan(
            one_step, (state, delta, stats), (jnp.arange(n_iter), keys)
        )
        return state, delta, stats

    return scan_phase


def _phase_collect(kernel: Callable, n_iter: int, cfg: RunConfig, get_stats_x):
    """Frozen-delta sampling phase that also stacks the trajectories."""

    def one_step(carry, key):
        state, delta, stats = carry
        x_prev = get_stats_x(state)
        new_state = kernel(key, state, delta)
        stats = update_stats(stats, x_prev, get_stats_x(new_state),
                             new_state.updated, beta=cfg.beta)
        return (new_state, delta, stats), get_stats_x(new_state)

    def scan_phase(key, state, delta):
        keys = jax.random.split(key, n_iter)
        stats = init_stats(get_stats_x(state), accept_shape=jnp.shape(state.updated))
        (state, delta, stats), xs = jax.lax.scan(one_step, (state, delta, stats), keys)
        return state, delta, stats, xs

    return scan_phase


def run_chain(key, kernel: Callable, init_state, cfg: RunConfig,
              collect_samples: bool = False,
              get_stats_x: Callable = lambda s: s.x,
              delta_init=None) -> RunResult:
    """Burn-in with adaptation, then frozen-delta sampling.

    `kernel(key, state, delta) -> state` per the universal contract.
    `delta_init` (optional) overrides cfg.delta_init and may be a per-step
    (T,) vector (cSMC-style time-local adaptation).
    Returns a `RunResult`; `sampling_time` excludes burn-in and compilation
    (both phases are compiled before timing starts).
    """
    burn_key, sample_key = jax.random.split(jax.random.fold_in(key, 0))
    delta0 = jnp.asarray(cfg.delta_init if delta_init is None else delta_init)

    burn = jax.jit(_phase(kernel, max(cfg.burnin, 1), True, cfg, get_stats_x))
    state, delta, _ = burn(burn_key, init_state, delta0)

    if collect_samples:
        sample = jax.jit(_phase_collect(kernel, cfg.n_samples, cfg, get_stats_x))
        lowered = sample.lower(sample_key, state, delta).compile()
        jax.block_until_ready((state, delta))
        tic = time.perf_counter()
        state, delta, stats, samples = lowered(sample_key, state, delta)
        jax.block_until_ready(samples)
        toc = time.perf_counter()
    else:
        sample = jax.jit(_phase(kernel, cfg.n_samples, False, cfg, get_stats_x))
        lowered = sample.lower(sample_key, state, delta).compile()
        jax.block_until_ready((state, delta))
        tic = time.perf_counter()
        state, delta, stats = lowered(sample_key, state, delta)
        jax.block_until_ready(stats)
        toc = time.perf_counter()
        samples = None

    return RunResult(state=state, stats=stats, delta=delta, samples=samples,
                     sampling_time=toc - tic)
