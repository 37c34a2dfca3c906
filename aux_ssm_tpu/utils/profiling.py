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


def fence(x):
    """Force device completion of `x` with a host read of one leaf element.

    On the remote-TPU tunnel backend `jax.block_until_ready` can return one
    in-flight computation early (measured: repeat loops reporting ~0 ms for
    a 46 ms kernel); materialising any output element on the host is the
    only reliable timing fence — and a no-op cost elsewhere. This is THE
    canonical fence: every timer in the library and benchmarks goes through
    it so the tunnel semantics are encoded once."""
    import numpy as np
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)


def timeit_ms(fn, *args, n_iter=5):
    """Median wall-clock of `fn(*args)` in ms, tunnel-safe: each call is
    salted with a unique scalar input (the tunnel can serve repeated
    identical executions from cache), fenced with a host read, and the first
    sample is dropped (it absorbs the previous call's in-flight tail)."""
    import jax.numpy as jnp
    f = jax.jit(lambda salt, *a: jnp.sum(fn(*a)) + salt)
    float(f(jnp.float32(-1.0), *args))
    times = []
    for i in range(n_iter):
        tic = time.perf_counter()
        float(f(jnp.float32(i), *args))
        times.append(time.perf_counter() - tic)
    times = sorted(times[1:])
    return times[len(times) // 2] * 1e3


@contextlib.contextmanager
def timer(label="block", sync=None):
    """Host wall-clock timer; pass `sync` (an array/pytree) to block on
    device completion before stopping the clock (see `fence`)."""
    tic = time.perf_counter()
    box = {}
    try:
        yield box
    finally:
        if sync is not None:
            fence(sync)
        box["seconds"] = time.perf_counter() - tic
        box["label"] = label
