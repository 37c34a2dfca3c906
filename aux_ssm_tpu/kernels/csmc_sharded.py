"""cSMC with the particle axis sharded over a device mesh.

New-to-the-build component (the reference is single-client; SURVEY §2.4 P4):
the forward sweep runs with N particles sharded over the `particles` mesh
axis. All per-particle model math (proposal sampling, potentials) stays
chip-local; the two global operations — weight normalisation and the
conditional-resampling gather — are expressed as ordinary jnp ops on arrays
carrying a NamedSharding constraint, which GSPMD lowers to psum /
all-gather+dynamic-slice over ICI. The categorical indices are computed from
replicated normalised weights, so the draw is bitwise identical to the
single-chip kernel with the same key.

The backward pass (O(T N) gathers on stored trajectories) runs replicated —
it is a negligible fraction of the per-step work at the target scales.
"""
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .csmc import forward_pass, backward_scanning_pass, backward_sampling_pass
from .csmc_base import CSMCState, Distribution, UnivariatePotential, Dynamics, Potential
from ..ops import resampling as resampling_mod
from ..parallel.mesh import PARTICLES


def get_sharded_kernel(M0: Distribution, G0: UnivariatePotential, Mt: Dynamics,
                       Gt: Potential, N: int, mesh, backward: bool = False,
                       Pt: Dynamics = None, resampling="multinomial"):
    """Like `csmc.get_kernel` but with the particle axis sharded over
    `mesh`'s `particles` axis. N must be divisible by the axis size."""
    n_shards = mesh.shape[PARTICLES]
    if N % n_shards:
        raise ValueError(f"N={N} not divisible by particles axis size {n_shards}")
    if backward and Pt is None:
        Pt = Mt
    if backward and not hasattr(Pt, "logpdf"):
        raise ValueError("backward=True requires `Pt` to implement logpdf.")
    resample = resampling_mod.get(resampling) if isinstance(resampling, str) else resampling

    particle_sharding = NamedSharding(mesh, P(PARTICLES))

    if n_shards == 1:
        # A 1-device particles mesh is plain single-chip execution; passing
        # no constraint lets `forward_pass` take its fused Pallas paths
        # (which are disabled under sharding constraints).
        constrain = None
    else:
        def constrain(z):
            return jax.lax.with_sharding_constraint(z, particle_sharding)

    def kernel(key, state):
        key_fwd, key_bwd = jax.random.split(key)
        w_T, xs, log_ws, ancestors = forward_pass(
            key_fwd, state.x, M0, G0, Mt, Gt, N, resample, constrain=constrain
        )
        if backward:
            x, picked = backward_sampling_pass(key_bwd, Pt, w_T, xs, log_ws)
        else:
            x, picked = backward_scanning_pass(key_bwd, w_T, xs, ancestors)
        return CSMCState(x=x, updated=picked != 0)

    def init(x_star):
        T = x_star.shape[0]
        return CSMCState(x=x_star, updated=jnp.zeros((T,), dtype=bool))

    return init, kernel
