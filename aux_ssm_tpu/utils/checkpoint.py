"""Chain checkpoint/resume via orbax.

The reference has no checkpointing (results written once at the end,
SURVEY §5); pod-scale runs need restartability. Sampler states are pytrees
(chex dataclasses / NamedTuples), so checkpoints capture the full chain
state: trajectories, deltas, online statistics, and the iteration counter.
"""
import os
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_checkpoint(directory: str, step: int, state: Any, force: bool = True):
    """Save a sampler-state pytree at `directory/step_<k>`."""
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    _checkpointer().save(path, jax.tree.map(np.asarray, state), force=force)
    return path


def latest_step(directory: str) -> Optional[int]:
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                continue
    return max(steps) if steps else None


def restore_checkpoint(directory: str, step: Optional[int] = None, target: Any = None):
    """Restore the pytree saved at `step` (default: latest). `target`
    (optional example pytree) restores leaves with matching structure/dtype."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    restored = _checkpointer().restore(path, item=target)
    return step, restored
