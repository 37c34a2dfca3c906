"""Device-mesh construction helpers."""
import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


CHAINS, PARTICLES, BATCH = "chains", "particles", "batch"


def make_mesh(axis_sizes=None, devices=None, axis_names=(CHAINS,)):
    """Build a Mesh over `devices` (default: all) with the given axis names.

    `axis_sizes` (tuple, same length as `axis_names`) may use -1 for one
    inferred axis; default is all devices on the first axis.
    """
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (n,) + (1,) * (len(axis_names) - 1)
    sizes = list(axis_sizes)
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh sizes {sizes} do not multiply to {n} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, axis_names)


def local_mesh(axis_name=CHAINS):
    """1-D mesh over all local devices."""
    return make_mesh(axis_names=(axis_name,))


def chain_sharding(mesh, extra_dims=0):
    """NamedSharding placing the leading (chain) axis on the chains mesh axis
    and replicating the rest."""
    return NamedSharding(mesh, P(CHAINS, *([None] * extra_dims)))


def replicated(mesh):
    return NamedSharding(mesh, P())
