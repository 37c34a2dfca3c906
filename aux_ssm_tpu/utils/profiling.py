"""Profiling helpers (SURVEY §5: the reference times with io_callback
tic/toc pairs; the build exposes `jax.profiler` traces + a host-side timer).
"""
import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf:

        with profiling.trace("/tmp/trace"):
            run_chain(...)
    """
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timer(label="block", sync=None):
    """Host wall-clock timer; pass `sync` (an array/pytree) to block on
    device completion before stopping the clock. The fence is a host read of
    one leaf element: on the remote-TPU tunnel backend `block_until_ready`
    can return one in-flight computation early, while materialising any
    output element on the host is reliable (and a no-op cost elsewhere)."""
    import numpy as np
    tic = time.perf_counter()
    box = {}
    try:
        yield box
    finally:
        if sync is not None:
            leaf = jax.tree.leaves(sync)[0]
            np.asarray(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)
        box["seconds"] = time.perf_counter() - tic
        box["label"] = label
