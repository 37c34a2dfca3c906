"""Reference-compatible namespace mirroring `aux_samplers.csmc`
(reference `csmc/__init__.py:1-5`): generic/independent auxiliary PG kernel
factories and the Feynman–Kac model ABCs."""

from .kernels.csmc_aux import get_kernel as get_generic_kernel
from .kernels.csmc_independent import get_kernel as get_independent_kernel
from .kernels.csmc_base import (
    CSMCState, Distribution, UnivariatePotential, Dynamics, Potential,
)

__all__ = [
    "get_generic_kernel",
    "get_independent_kernel",
    "CSMCState",
    "Distribution",
    "UnivariatePotential",
    "Dynamics",
    "Potential",
]
