"""Sequential conditional SMC (particle Gibbs) kernel.

Capability parity with `_primitives/csmc/csmc.py` (kernel factory :16-66,
forward pass :69-107, backward-scanning pass :110-124, backward-sampling pass
:127-149) — independent implementation. Unlike the reference (which hardwires
conditional multinomial, `csmc.py:54`), the resampling scheme is selectable.

The particle axis is the natural TPU vectorisation axis: all model callables
(`M0.sample`, `G0`, `Mt.sample`, `Gt`) receive the full (N, d) particle block
so XLA maps them onto the VPU/MXU; under `shard_map` the same kernel runs
with N sharded across chips (see `parallel/`).
"""
import jax
import jax.numpy as jnp

from .csmc_base import CSMCState, Distribution, UnivariatePotential, Dynamics, Potential
from ..ops.logspace import normalize
from ..ops import resampling as resampling_mod


def get_kernel(M0: Distribution, G0: UnivariatePotential, Mt: Dynamics, Gt: Potential,
               N: int, backward: bool = False, Pt: Dynamics = None,
               resampling="multinomial", ancestor_sampling: bool = False):
    """Build a cSMC kernel.

    Parameters
    ----------
    M0, G0, Mt, Gt : Feynman–Kac model components (see `csmc_base`).
    N : int
        Number of particles.
    backward : bool
        Use Whiteley backward *sampling* (requires `Pt.logpdf`) instead of
        ancestor *scanning*.
    Pt : Dynamics, optional
        True-model dynamics for backward/ancestor sampling; defaults to Mt.
    resampling : str or Callable
        'multinomial' (default), 'systematic', or a callable
        (key, weights) -> indices with index 0 pinned.
    ancestor_sampling : bool
        PGAS (Lindsten et al. 2014): redraw the reference particle's ancestor
        at every forward step from w_{t-1} * p(x*_t | x_{t-1}) (requires
        `Pt.logpdf`). Composes with either backward pass.

    Returns
    -------
    (init, kernel) following the universal kernel contract;
    kernel(key, state) -> CSMCState.
    """
    if (backward or ancestor_sampling) and Pt is None:
        Pt = Mt
    if (backward or ancestor_sampling) and not hasattr(Pt, "logpdf"):
        raise ValueError("backward/ancestor sampling requires `Pt` to implement logpdf.")
    resample = resampling_mod.get(resampling) if isinstance(resampling, str) else resampling

    def kernel(key, state):
        key_fwd, key_bwd = jax.random.split(key)
        w_T, xs, log_ws, ancestors = forward_pass(
            key_fwd, state.x, M0, G0, Mt, Gt, N, resample,
            ancestor_Pt=Pt if ancestor_sampling else None,
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


def forward_pass(key, x_star, M0, G0, Mt, Gt, N, resample, constrain=None,
                 ancestor_Pt=None):
    """Conditional SMC forward sweep; particle 0 is pinned to `x_star`.

    `constrain` (optional) is applied to every particle-axis array — pass a
    `with_sharding_constraint` closure to run the sweep with N sharded over a
    `particles` mesh axis (GSPMD then lowers the resampling gather and weight
    normalisation to ICI collectives); see `csmc_sharded.get_sharded_kernel`.

    `ancestor_Pt` (optional Dynamics) turns on PGAS ancestor sampling: the
    reference particle's ancestor is redrawn from
    w_{t-1} * ancestor_Pt.logpdf(x*_t | x_{t-1}).
    """
    if constrain is None:
        constrain = lambda z: z
    T = x_star.shape[0]
    keys = jax.random.split(key, T)

    x0 = constrain(M0.sample(keys[0], N))
    x0 = x0.at[0].set(x_star[0])
    log_w0 = G0(x0)
    w0 = normalize(log_w0)

    as_params = ancestor_Pt.params if ancestor_Pt is not None else Mt.params

    # For the default multinomial scheme, hoist the resampling RNG out of
    # the scan: one (T-1, N) uniform draw up front, inverse-CDF sampling per
    # step (same law; avoids a per-step threefry chain on TPU).
    hoisted = resample is resampling_mod.multinomial
    if hoisted:
        res_uniforms = jax.random.uniform(
            jax.random.fold_in(key, 1), (T - 1, N), dtype=x0.dtype)
    else:
        res_uniforms = jnp.zeros((T - 1, 1), dtype=x0.dtype)

    def body(carry, inp):
        w_prev, x_prev = carry
        Mt_params, Gt_params, Pt_params, x_star_t, key_t, u_t = inp
        resample_key, ancestor_key, sample_key = jax.random.split(key_t, 3)

        if hoisted:
            ancestors = resampling_mod.multinomial_from_uniforms(u_t, w_prev)
        else:
            ancestors = resample(resample_key, w_prev)
        if ancestor_Pt is not None:
            log_as = jnp.log(w_prev) + ancestor_Pt.logpdf(x_star_t, x_prev, Pt_params)
            a0 = jax.random.choice(ancestor_key, N, p=normalize(log_as))
            ancestors = ancestors.at[0].set(a0)
        x_prev = constrain(jnp.take(x_prev, ancestors, axis=0))

        x_t = constrain(Mt.sample(sample_key, x_prev, Mt_params))
        x_t = x_t.at[0].set(x_star_t)

        log_w = Gt(x_t, x_prev, Gt_params)
        return (normalize(log_w), x_t), (x_t, log_w, ancestors)

    (w_T, _), (xs, log_ws, ancestors) = jax.lax.scan(
        body, (w0, x0),
        (Mt.params, Gt.params, as_params, x_star[1:], keys[1:], res_uniforms),
    )
    xs = jnp.concatenate([x0[None], xs], axis=0)
    log_ws = jnp.concatenate([log_w0[None], log_ws], axis=0)
    return w_T, xs, log_ws, ancestors


def backward_scanning_pass(key, w_T, xs, ancestors):
    """Trace one genealogy backwards from a draw at the final step."""
    ancestors = ancestors.astype(jnp.int32)
    B_T = jax.random.choice(key, w_T.shape[0], p=w_T).astype(jnp.int32)

    def body(B_t, inp):
        xs_prev, A_t = inp
        B_prev = A_t[B_t]
        return B_prev, (xs_prev[B_prev], B_prev)

    _, (traj, picked) = jax.lax.scan(body, B_T, (xs[:-1], ancestors), reverse=True)
    traj = jnp.concatenate([traj, xs[-1, B_T][None]], axis=0)
    picked = jnp.concatenate([picked, B_T[None]], axis=0)
    return traj, picked


def backward_sampling_pass(key, Pt: Dynamics, w_T, xs, log_ws):
    """Whiteley backward sampling: re-draw the index at every step using the
    smoothing weights log_w_t + log p(x_{t+1} | x_t)."""
    T = xs.shape[0]
    keys = jax.random.split(key, T)

    B_T = jax.random.choice(keys[-1], w_T.shape[0], p=w_T)
    x_T = xs[-1, B_T]

    def body(x_next, inp):
        key_t, xs_t, log_w_t, Pt_params = inp
        log_w = Pt.logpdf(x_next, xs_t, Pt_params) + log_w_t
        B_t = jax.random.choice(key_t, log_w.shape[0], p=normalize(log_w))
        return xs_t[B_t], (xs_t[B_t], B_t)

    inputs = (keys[:-1], xs[:-1], log_ws[:-1], Pt.params)
    _, (traj, picked) = jax.lax.scan(body, x_T, inputs, reverse=True)
    traj = jnp.concatenate([traj, x_T[None]], axis=0)
    picked = jnp.concatenate([picked, B_T[None]], axis=0)
    return traj, picked
