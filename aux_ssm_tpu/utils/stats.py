"""Online in-scan chain statistics: EJSD, moments, acceptance EMAs.

Capability parity with the reference experiment drivers' `stats_fn` and
acceptance moving averages (`examples/stochastic_volatility/
experiment.py:82-84,113-115`) — packaged once instead of re-written per
experiment. All state is a pytree updated purely inside the sampling scan;
under pjit with a sharded chain axis the updates stay chip-local.
"""
from typing import Optional

import chex
import jax.numpy as jnp


@chex.dataclass
class OnlineStats:
    """Running statistics accumulated inside the sampling loop.

    ejsd       — running mean of (x_{k+1} - x_k)^2, per trajectory element
    mean_x     — running mean of x
    mean_x2    — running mean of x^2
    accept_cum — cumulative mean acceptance rate; keeps the native shape of
                 the kernel's `updated` field (scalar for Kalman, per-time-
                 step (T,) for cSMC — enabling time-local delta adaptation)
    accept_win — beta-EMA (windowed) acceptance rate, same shape
    step       — iteration counter
    """
    ejsd: chex.Array
    mean_x: chex.Array
    mean_x2: chex.Array
    accept_cum: chex.Array
    accept_win: chex.Array
    step: chex.Array


def init_stats(x0, accept_shape=()):
    z = jnp.zeros_like(x0)
    return OnlineStats(
        ejsd=z,
        mean_x=z,
        mean_x2=z,
        accept_cum=jnp.zeros(accept_shape, dtype=x0.dtype),
        accept_win=jnp.zeros(accept_shape, dtype=x0.dtype),
        step=jnp.zeros((), dtype=jnp.int32),
    )


def update_stats(stats: OnlineStats, x_prev, x_new, accepted, beta: float = 0.05,
                 weight: Optional[jnp.ndarray] = None):
    """One online update. `accepted` may be a scalar bool (Kalman) or a (T,)
    vector (cSMC); its shape is preserved in the acceptance statistics.
    `beta` is the EMA window rate."""
    k = stats.step + 1
    fk = k.astype(stats.mean_x.dtype)
    rate = accepted.astype(stats.mean_x.dtype) if weight is None else weight

    jump2 = (x_new - x_prev) ** 2
    return OnlineStats(
        ejsd=stats.ejsd + (jump2 - stats.ejsd) / fk,
        mean_x=stats.mean_x + (x_new - stats.mean_x) / fk,
        mean_x2=stats.mean_x2 + (x_new ** 2 - stats.mean_x2) / fk,
        accept_cum=stats.accept_cum + (rate - stats.accept_cum) / fk,
        accept_win=jnp.where(k == 1, rate, (1 - beta) * stats.accept_win + beta * rate),
        step=k,
    )


def variance(stats: OnlineStats):
    """Posterior variance estimate from the accumulated moments."""
    return stats.mean_x2 - stats.mean_x ** 2
