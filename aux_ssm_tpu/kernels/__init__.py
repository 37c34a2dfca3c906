"""Sampler kernels (L3): every sampler follows the universal contract
`get_kernel(...) -> (init, kernel)` with `init(x0) -> State` and
`kernel(key, state[, delta]) -> State`, where `State` is a pytree dataclass
holding at least the trajectory `x` and an acceptance indicator `updated`
(contract as in reference `kalman/generic.py:53-94`, `_primitives/base.py`).
Kernels are pure functions, safe under jit/scan/vmap/shard_map.
"""

from .base import SamplerState
from .adaptation import delta_adaptation

__all__ = ["SamplerState", "delta_adaptation"]
