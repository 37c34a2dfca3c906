"""Auxiliary particle Gibbs with independent (per-time-step) proposals —
the Finke & Thiery (2021) construction in the auxiliary paradigm, with
optional Langevin-style gradient shifts and a parallel-in-time path.

Capability parity with reference `csmc/independent.py:18-268` — independent
implementation.

Classical path: proposal at step t is N(u_t + (delta_t/2) * grad_t, delta_t/2 I)
where `grad = jax.grad` of the whole-trajectory Feynman–Kac log-density at u.
Auxiliary potential wrappers absorb the model density and the
proposal/importance corrections so that the inner cSMC targets exactly
pi(x | u).

Parallel path: the same proposals viewed as independent per-time
Distributions feeding the PIT (divide-and-conquer) kernel.
"""
import chex
import jax
import jax.numpy as jnp
from jax.scipy.stats import norm

from .csmc_aux import get_kernel as get_generic_kernel
from .csmc_base import CSMCState, Distribution, UnivariatePotential, Dynamics, Potential
from .pit import get_kernel as get_pit_kernel


def get_kernel(M0: Distribution, G0: UnivariatePotential, Mt: Dynamics, Gt: Potential,
               N: int, backward: bool = False, Pt: Dynamics = None,
               gradient: bool = False, parallel: bool = False,
               resampling="multinomial"):
    """Auxiliary PG with independent proposals.

    Parameters mirror the model interface (`csmc_base`); `gradient` turns on
    the Langevin shift, `parallel` selects the PIT (divide-and-conquer)
    execution. Returns (init, kernel) with kernel(key, state, delta).
    """
    if parallel:
        return _parallel_kernel(M0, G0, Mt, Gt, N, gradient)
    return _classical_kernel(M0, G0, Mt, Gt, N, backward, Pt, gradient, resampling)


def trajectory_logpdf(u, M0, G0, Mt, Gt):
    """Whole-trajectory Feynman–Kac log-density at u (differentiable; used
    for the Langevin gradient shift, reference `independent.py:121-134`)."""
    out = M0.logpdf(u[0]) + G0(u[0])

    def step(u_next, u_t, Gt_param, Mt_param):
        return Gt(u_next, u_t, Gt_param) + Mt.logpdf(u_next, u_t, Mt_param)

    incs = jax.vmap(step)(u[1:], u[:-1], Gt.params, Mt.params)
    return out + jnp.sum(incs)


def _classical_kernel(M0, G0, Mt, Gt, N, backward, Pt, gradient, resampling):
    def factory(u, scale):
        grad = jax.grad(trajectory_logpdf)(u, M0, G0, Mt, Gt) if gradient else jnp.zeros_like(u)
        m0 = AuxiliaryM0(u=u[0], sqrt_half_delta=scale[0], grad=grad[0])
        mt = AuxiliaryMtDynamics(params=(u[1:], scale[1:], grad[1:]))
        if gradient:
            g0 = GradientAuxiliaryG0(M0=M0, G0=G0, u=u[0], sqrt_half_delta=scale[0], grad=grad[0])
            gt = GradientAuxiliaryGt(Mt=Mt, Gt=Gt, params=(u[1:], scale[1:], grad[1:]))
        else:
            g0 = AuxiliaryG0(M0=M0, G0=G0)
            gt = AuxiliaryGt(Mt=Mt, Gt=Gt)
        return m0, g0, mt, gt

    return get_generic_kernel(factory, N, backward, Pt, resampling)


def _parallel_kernel(M0, G0, Mt, Gt, N, gradient):
    def factory(u, scale):
        if gradient:
            grad = jax.grad(trajectory_logpdf)(u, M0, G0, Mt, Gt)
            mt = AuxiliaryMtDistribution(params=(u, scale, grad))
            qt = AuxiliaryMtDistribution(params=(u, scale, None))
        else:
            mt = AuxiliaryMtDistribution(params=(u, scale, None))
            qt = None
        g0 = AuxiliaryG0(M0=M0, G0=G0)
        gt = AuxiliaryGt(Mt=Mt, Gt=Gt)
        return mt, g0, gt, qt

    def kernel(key, state, delta):
        x = state.x
        T = x.shape[0]
        sqrt_half_delta = jnp.sqrt(0.5 * delta)
        if jnp.ndim(sqrt_half_delta) == 0:
            sqrt_half_delta = jnp.full((T,), sqrt_half_delta, dtype=x.dtype)
        aux_key, inner_key = jax.random.split(key)

        u = x + sqrt_half_delta[:, None] * jax.random.normal(aux_key, x.shape, dtype=x.dtype)
        mt, g0, gt, qt = factory(u, sqrt_half_delta)
        _, pit_kernel = get_pit_kernel(mt, g0, gt, N, qt)
        return pit_kernel(inner_key, state)

    def init(x):
        T = x.shape[0]
        return CSMCState(x=x, updated=jnp.zeros((T,), dtype=bool))

    return init, kernel


# --------------------------------------------------------------------------
# Auxiliary proposal/potential wrappers
# --------------------------------------------------------------------------

@chex.dataclass
class AuxiliaryM0(Distribution):
    """N(u_0 + (delta_0/2) grad_0, (delta_0/2) I)."""
    u: chex.Array
    sqrt_half_delta: chex.Array
    grad: chex.Array

    def _mean(self):
        return self.u + self.sqrt_half_delta ** 2 * self.grad

    def logpdf(self, x):
        return jnp.sum(norm.logpdf(x, self._mean(), self.sqrt_half_delta), axis=-1)

    def sample(self, key, N):
        eps = jax.random.normal(key, (N, *self.u.shape), dtype=self.u.dtype)
        return self._mean()[None] + self.sqrt_half_delta * eps


@chex.dataclass
class AuxiliaryG0(UnivariatePotential):
    """G0(x) * M0(x): the initial model density absorbed into the potential."""
    M0: Distribution
    G0: UnivariatePotential

    def __call__(self, x):
        return self.G0(x) + self.M0.logpdf(x)


@chex.dataclass
class GradientAuxiliaryG0(UnivariatePotential):
    """As `AuxiliaryG0`, plus the N(x; u, .)/N(x; u + shift, .) importance
    correction for the gradient-shifted proposal."""
    M0: Distribution
    G0: UnivariatePotential
    u: chex.Array
    sqrt_half_delta: chex.Array
    grad: chex.Array

    def __call__(self, x):
        mean = self.u + self.sqrt_half_delta ** 2 * self.grad
        out = self.G0(x) + self.M0.logpdf(x)
        out += jnp.sum(norm.logpdf(x, self.u, self.sqrt_half_delta), axis=-1)
        out -= jnp.sum(norm.logpdf(x, mean, self.sqrt_half_delta), axis=-1)
        return out


@chex.dataclass
class AuxiliaryMtDynamics(Dynamics):
    """Independent proposal N(u_t + (delta_t/2) grad_t, (delta_t/2) I) exposed
    through the Dynamics interface (ignores x_t)."""

    def sample(self, key, x_t, params):
        u_t, sqrt_half_delta, grad_t = params
        mean = u_t[None, :] + sqrt_half_delta ** 2 * grad_t[None, :]
        return mean + sqrt_half_delta * jax.random.normal(key, x_t.shape, dtype=u_t.dtype)

    def logpdf(self, x_t_p_1, x_t, params):
        u_t, sqrt_half_delta, grad_t = params
        mean = u_t + sqrt_half_delta ** 2 * grad_t
        return jnp.sum(norm.logpdf(x_t_p_1, mean, sqrt_half_delta), axis=-1)


@chex.dataclass
class AuxiliaryMtDistribution(Distribution):
    """Same proposal exposed through the Distribution interface (for the PIT
    path); `grad` entry of params may be None."""
    params: chex.ArrayTree

    def _mean(self):
        u_t, sqrt_half_delta, grad_t = self.params
        if grad_t is None:
            return u_t
        return u_t + sqrt_half_delta ** 2 * grad_t

    def sample(self, key, N):
        u_t, sqrt_half_delta, _ = self.params
        eps = jax.random.normal(key, (N, u_t.shape[-1]), dtype=u_t.dtype)
        return self._mean()[None, :] + sqrt_half_delta * eps

    def logpdf(self, x):
        _, sqrt_half_delta, _ = self.params
        return jnp.sum(norm.logpdf(x, self._mean(), sqrt_half_delta), axis=-1)


@chex.dataclass
class AuxiliaryGt(Potential):
    """Model transition density and potential absorbed into the weight."""
    Mt: Dynamics = None
    Gt: Potential = None

    def __post_init__(self):
        self.params = (self.Mt.params, self.Gt.params)

    def __call__(self, x_t_p_1, x_t, params):
        Mt_params, Gt_params = params
        return self.Mt.logpdf(x_t_p_1, x_t, Mt_params) + self.Gt(x_t_p_1, x_t, Gt_params)


@chex.dataclass
class GradientAuxiliaryGt(Potential):
    """As `AuxiliaryGt`, plus the gradient-shift importance correction."""
    Mt: Dynamics = None
    Gt: Potential = None

    def __post_init__(self):
        self.params = (self.params, self.Mt.params, self.Gt.params)

    def __call__(self, x_t_p_1, x_t, params):
        (u_t, sqrt_half_delta, grad_t), Mt_params, Gt_params = params
        mean = u_t + sqrt_half_delta ** 2 * grad_t
        out = self.Mt.logpdf(x_t_p_1, x_t, Mt_params) + self.Gt(x_t_p_1, x_t, Gt_params)
        out += jnp.sum(norm.logpdf(x_t_p_1, u_t, sqrt_half_delta))
        out -= jnp.sum(norm.logpdf(x_t_p_1, mean, sqrt_half_delta))
        return out
