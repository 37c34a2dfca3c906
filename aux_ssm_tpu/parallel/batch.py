"""Cross-chip batch/component parallelism (SURVEY §2.4 P5).

The batched LGSSM layout runs B independent (scalar or small-d) filters as
one (T, B, ...) program (reference batched contract
`_primitives/kalman/base.py:27-49`; here `ops/filtering.py` broadcast
algebra).  Every op in that stack is elementwise over B — the associative
scan runs over T, the per-step algebra over trailing dims — so sharding B
over a `batch` mesh axis needs NO collectives inside the filter/sampler:
GSPMD keeps each chip's B/n slice local end-to-end, and only the scalar
reductions (log-likelihood `ell`, the MH ratio sums) lower to psum.

Layout convention (matches `ops/lgssm.LGSSM` batched shapes):
  m0 (B, dx), P0 (B, dx, dx)          -> P(batch)
  Fs/Qs/bs/Hs/Rs/cs/ys/x (T, B, ...)  -> P(None, batch)
"""
import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import BATCH
from ..ops.lgssm import LGSSM


def time_major_sharding(mesh, axis=BATCH):
    """Sharding for (T, B, ...) arrays: batch axis 1 on the mesh axis."""
    return NamedSharding(mesh, P(None, axis))


def shard_time_major(mesh, tree, axis=BATCH):
    """Place every leaf's axis 1 (batch) on `mesh[axis]`."""
    s = time_major_sharding(mesh, axis)
    return jax.tree.map(lambda z: jax.device_put(z, s), tree)


def shard_batched_lgssm(mesh, lgssm: LGSSM, axis=BATCH):
    """Shard a batched LGSSM: m0/P0 lead with B, the rest are time-major."""
    s0 = NamedSharding(mesh, P(axis))
    st = time_major_sharding(mesh, axis)
    put0 = lambda z: jax.device_put(z, s0)
    putt = lambda z: jax.device_put(z, st)
    return LGSSM(put0(lgssm.m0), put0(lgssm.P0), putt(lgssm.Fs),
                 putt(lgssm.Qs), putt(lgssm.bs), putt(lgssm.Hs),
                 putt(lgssm.Rs), putt(lgssm.cs))


def constrain_batch(tree, mesh, axis=BATCH):
    """`with_sharding_constraint` pinning axis 1 of every (T, B, ...) leaf —
    for use INSIDE jit (e.g. on a scan carry) to keep B sharded."""
    s = time_major_sharding(mesh, axis)
    return jax.tree.map(lambda z: jax.lax.with_sharding_constraint(z, s), tree)


def batch_sharded_kernel(kernel, mesh, axis=BATCH):
    """Wrap a batched-layout sampler kernel so its (T, B, ...) trajectory
    state stays sharded over `mesh[axis]` through `lax.scan` iterations
    (without the constraint XLA may re-replicate the carry between steps).

    The kernel itself is untouched — same keys, same draws — so results
    match the unsharded kernel up to cross-chip reduction order (the psum of
    the MH-ratio sums)."""

    def wrapped(key, state, delta):
        state = state.replace(x=jax.lax.with_sharding_constraint(
            state.x, time_major_sharding(mesh, axis)))
        out = kernel(key, state, delta)
        return out.replace(x=jax.lax.with_sharding_constraint(
            out.x, time_major_sharding(mesh, axis)))

    return wrapped
