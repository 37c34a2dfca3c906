"""Step-size (delta) adaptation (parity: reference `common.py:4-32`).

Robbins–Monro style multiplicative update on log-delta targeting an
acceptance rate. Works elementwise, so it applies equally to scalar deltas
(auxiliary Kalman), per-time-step `(T,)` delta vectors (cSMC), and
per-chain-sharded deltas — under `pjit` the update is purely local.
"""
import jax.numpy as jnp


def delta_adaptation(delta, target_rate, acceptance_rate, adaptation_rate,
                     min_delta=1e-20, max_delta=1e20):
    """Multiplicative delta update: delta * exp(rate * (acc - target)),
    clipped to [min_delta, max_delta]."""
    out = delta * jnp.exp(adaptation_rate * (acceptance_rate - target_rate))
    return jnp.clip(out, min_delta, max_delta)
