"""Feynman–Kac model interface for cSMC samplers.

Capability parity with `_primitives/csmc/base.py:18-71` — independent
implementation. Four small pytree-dataclass ABCs describe the model:

  M0 : Distribution          — initial proposal/model distribution
  G0 : UnivariatePotential   — initial potential (weight at t=0)
  Mt : Dynamics              — proposal/model transition kernels
  Gt : Potential             — transition potentials (weights at t>=1)

`Dynamics`/`Potential` carry a pytree `params` whose leading axis is time;
the cSMC scan slices one time step per iteration. All classes are chex
dataclasses so instances are pytrees and can cross jit/vmap/shard_map
boundaries as data.
"""
import abc
from typing import Optional

import chex

from .base import SamplerState

_NOT_IMPLEMENTED_MSG = (
    "logpdf is not implemented for {} but was called; backward-sampling "
    "variants require a valid logpdf — implement it or use backward=False."
)


@chex.dataclass
class CSMCState(SamplerState):
    """State of a cSMC chain: reference trajectory and per-time-step update
    indicator (ancestor != 0)."""
    x: chex.ArrayTree
    updated: chex.Array


@chex.dataclass
class UnivariatePotential(abc.ABC):
    """Potential x -> log G_0(x); batched over the particle axis."""

    def __call__(self, x):
        raise NotImplementedError


@chex.dataclass
class Distribution(abc.ABC):
    """A sampleable distribution with optional logpdf."""

    def sample(self, key, N):
        raise NotImplementedError

    def logpdf(self, x):
        raise NotImplementedError(_NOT_IMPLEMENTED_MSG.format(type(self).__name__))


@chex.dataclass
class Dynamics(abc.ABC):
    """Conditional distribution x_{t+1} | x_t with per-time-step params."""
    params: Optional[chex.ArrayTree] = None

    def sample(self, key, x_t, params):
        raise NotImplementedError

    def logpdf(self, x_t_p_1, x_t, params):
        raise NotImplementedError(_NOT_IMPLEMENTED_MSG.format(type(self).__name__))


@chex.dataclass
class Potential(abc.ABC):
    """Potential (x_{t+1}, x_t) -> log G_t with per-time-step params."""
    params: Optional[chex.ArrayTree] = None

    def __call__(self, x_t_p_1, x_t, params):
        raise NotImplementedError
