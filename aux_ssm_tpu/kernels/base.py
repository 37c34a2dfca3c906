"""Base sampler state (parity: `_primitives/base.py:8-10`)."""
import chex


@chex.dataclass
class SamplerState:
    """Base class for all sampler states: a pytree with the trajectory `x`."""
    x: chex.ArrayTree
