"""Fused Pallas kernels for the remaining Kalman hot paths: associative
element construction, log-likelihood increments, and the backward-sampling
affine scan. Together with `filter_scan` these put the whole filter+sampler
compute on the lane-major VMEM path.

All kernels are elementwise over the time axis (lanes) except the affine
scan, which reuses the block-scan-with-carry structure of `filter_scan`.
Masked missing-data handling is data-flow only (isfinite -> where), so the
kernels accept NaN observations exactly like the XLA path.
"""
import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import lanelin as ll

_LOG_2PI = math.log(2.0 * math.pi)
# The element/ell kernels are elementwise over lanes — no scan levels to
# amortise — so the smallest lane-aligned block keeps the VMEM working set
# (which grows with dx, dy) within budget for augmented observation models.
_BLOCK = 128


def _masked_obs(H, c, R, y, dy, T):
    """Row-list masked projection (see ops/lgssm.mask_observation)."""
    mask = jnp.isfinite(y)                      # (dy, T) bool
    fmask = mask.astype(c.dtype)
    H_eff = [jnp.where(ll.ent(mask, i), jnp.nan_to_num(H[i]), 0.0)
             for i in range(dy)]
    c_eff = jnp.where(mask, jnp.nan_to_num(c), 0.0)
    lane_eye = ll.mat_eye(dy, T, c.dtype)
    R_eff = [
        jnp.where(ll.ent(mask, i) & mask, jnp.nan_to_num(R[i]), 0.0)
        + lane_eye[i] * (1.0 - ll.ent(fmask, i))
        for i in range(dy)
    ]
    y_eff = jnp.where(mask, jnp.nan_to_num(y), 0.0)
    return y_eff, H_eff, c_eff, R_eff, mask, fmask


def _predict(F, Q, b, m, P):
    m_pred = ll.mat_vec(F, m) + b
    FT = ll.mat_transpose(F)
    P_pred = ll.mat_add(ll.mat_mul(F, ll.mat_mul(P, FT)), Q)
    return m_pred, P_pred


# --------------------------------------------------------------------------
# Element construction (see ops/filtering._make_one_element)
# --------------------------------------------------------------------------

def _elements_kernel(F_ref, Q_ref, b_ref, H_ref, R_ref, c_ref, y_ref,
                     m_ref, P_ref,
                     A_ref, bel_ref, C_ref, eta_ref, J_ref, *, dx, dy, T):
    F = ll.mat_from_ref(F_ref, dx, dx, T)
    Q = ll.mat_from_ref(Q_ref, dx, dx, T)
    b = b_ref[:]
    H = ll.mat_from_ref(H_ref, dy, dx, T)
    R = ll.mat_from_ref(R_ref, dy, dy, T)
    c = c_ref[:]
    y = y_ref[:]
    m = m_ref[:]
    P = ll.mat_from_ref(P_ref, dx, dx, T)

    y_eff, H_eff, c_eff, R_eff, mask, _ = _masked_obs(H, c, R, y, dy, T)
    m_pred, P_pred = _predict(F, Q, b, m, P)

    HT = ll.mat_transpose(H_eff)
    S = ll.mat_sym(ll.mat_add(ll.mat_mul(H_eff, ll.mat_mul(P_pred, HT)), R_eff))
    SinvH, _ = ll.spd_solve(S, H_eff, dy, T)       # (dy, dx)
    SinvH_T = ll.mat_transpose(SinvH)               # (dx, dy)

    K = ll.mat_mul(P_pred, SinvH_T)                 # (dx, dy)
    HF = ll.mat_mul(H_eff, F)                       # (dy, dx)
    A = ll.mat_sub(F, ll.mat_mul(K, HF))

    y_diff_b = jnp.where(mask, y_eff - ll.mat_vec(H_eff, b) - c_eff, 0.0)
    y_diff_m = jnp.where(mask, y_eff - ll.mat_vec(H_eff, m_pred) - c_eff, 0.0)

    b_el = m_pred + ll.mat_vec(K, y_diff_m)
    KT = ll.mat_transpose(K)
    C = ll.mat_sym(ll.mat_sub(P_pred, ll.mat_mul(K, ll.mat_mul(S, KT))))

    FT = ll.mat_transpose(F)
    temp = ll.mat_mul(FT, SinvH_T)                  # (dx, dy)
    eta = ll.mat_vec(temp, y_diff_b)
    J = ll.mat_sym(ll.mat_mul(temp, HF))

    ll.mat_to_ref(A_ref, A, dx, T)
    bel_ref[:] = b_el
    ll.mat_to_ref(C_ref, C, dx, T)
    eta_ref[:] = eta
    ll.mat_to_ref(J_ref, J, dx, T)


# --------------------------------------------------------------------------
# Log-likelihood increments (see ops/filtering.kalman_predict_update)
# --------------------------------------------------------------------------

def _ell_kernel(F_ref, Q_ref, b_ref, H_ref, R_ref, c_ref, y_ref,
                m_ref, P_ref, ell_ref, *, dx, dy, T):
    F = ll.mat_from_ref(F_ref, dx, dx, T)
    Q = ll.mat_from_ref(Q_ref, dx, dx, T)
    b = b_ref[:]
    H = ll.mat_from_ref(H_ref, dy, dx, T)
    R = ll.mat_from_ref(R_ref, dy, dy, T)
    c = c_ref[:]
    y = y_ref[:]
    m = m_ref[:]
    P = ll.mat_from_ref(P_ref, dx, dx, T)

    y_eff, H_eff, c_eff, R_eff, mask, fmask = _masked_obs(H, c, R, y, dy, T)
    m_pred, P_pred = _predict(F, Q, b, m, P)

    HT = ll.mat_transpose(H_eff)
    S = ll.mat_sym(ll.mat_add(ll.mat_mul(H_eff, ll.mat_mul(P_pred, HT)), R_eff))
    L, log_det = ll.chol(S, dy, T)

    innov = jnp.where(mask, y_eff - ll.mat_vec(H_eff, m_pred) - c_eff, 0.0)
    w = ll.rows_vec(ll.tri_solve_lower(L, ll.vec_rows(innov, dy), dy))
    quad = jnp.sum(w * w, axis=0, keepdims=True)
    n_obs = jnp.sum(fmask, axis=0, keepdims=True)
    ell_ref[:] = -0.5 * quad - log_det - 0.5 * n_obs * _LOG_2PI


# --------------------------------------------------------------------------
# Affine block scan for backward sampling (see ops/sampling)
# --------------------------------------------------------------------------

def _affine_combine(left, right):
    """(G2 G1, G2 e1 + e2) — e2 applied after e1."""
    G1, e1 = left
    G2, e2 = right
    return ll.mat_mul(G2, G1), ll.mat_vec(G2, e1) + e2


def _affine_scan_kernel(G_ref, e_ref, oG_ref, oe_ref, cG_ref, ce_ref,
                        *, d, B, levels):
    i = pl.program_id(0)
    G = ll.mat_from_ref(G_ref, d, d, B)
    e = e_ref[:]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
    s = 1
    for _ in range(levels):
        left = ([pltpu.roll(r, s, axis=1) for r in G], pltpu.roll(e, s, axis=1))
        nG, ne = _affine_combine(left, (G, e))
        m = lane >= s
        G = [jnp.where(m, nG[k], G[k]) for k in range(d)]
        e = jnp.where(m, ne, e)
        s *= 2

    @pl.when(i == 0)
    def _():
        ll.mat_to_ref(cG_ref, ll.mat_eye(d, B, e.dtype), d, B)
        ce_ref[:] = jnp.zeros_like(e)

    carry = (ll.mat_from_ref(cG_ref, d, d, B), ce_ref[:])
    G, e = _affine_combine(carry, (G, e))

    ll.mat_to_ref(oG_ref, G, d, B)
    oe_ref[:] = e

    last = jax.lax.slice_in_dim
    ll.mat_to_ref(cG_ref, [jnp.broadcast_to(last(r, B - 1, B, axis=1), r.shape)
                           for r in G], d, B)
    ce_ref[:] = jnp.broadcast_to(last(e, B - 1, B, axis=1), e.shape)


# --------------------------------------------------------------------------
# Host wrappers
# --------------------------------------------------------------------------

def _lm(z):
    return jnp.moveaxis(z, 0, -1)


def _ulm(z):
    return jnp.moveaxis(z, -1, 0)


def _pad_lanes(z, Tp, fill=0.0):
    T = z.shape[0]
    if T == Tp:
        return z
    pad_shape = (Tp - T,) + z.shape[1:]
    return jnp.concatenate([z, jnp.full(pad_shape, fill, z.dtype)], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_make_elements(Fs, Qs, bs, Hs, Rs, cs, ys, m, P, interpret=False):
    """Pallas version of `ops.filtering._make_associative_elements`'s inner
    map: inputs (T, ...) with `m`, `P` the per-element linearisation states
    (first element carries the updated init, rest zeros)."""
    T, dx = bs.shape
    dy = cs.shape[-1]
    Tp = ((T + _BLOCK - 1) // _BLOCK) * _BLOCK

    args = []
    for z, fill in ((Fs, "eye"), (Qs, "eye"), (bs, 0.0), (Hs, 0.0), (Rs, "eye"),
                    (cs, 0.0), (ys, jnp.nan), (m, 0.0), (P, "eye")):
        if Tp != T:
            if fill == "eye":
                d_ = z.shape[-1]
                pad = jnp.broadcast_to(jnp.eye(d_, dtype=z.dtype), (Tp - T, d_, d_))
                z = jnp.concatenate([z, pad], axis=0)
            else:
                z = _pad_lanes(z, Tp, fill)
        args.append(_lm(z))

    def spec(shape):
        nd = len(shape)
        if nd == 3:
            return pl.BlockSpec((shape[0], shape[1], _BLOCK), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((shape[0], _BLOCK), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    in_specs = [spec(z.shape) for z in args]
    out_shapes = (
        jax.ShapeDtypeStruct((dx, dx, Tp), bs.dtype),
        jax.ShapeDtypeStruct((dx, Tp), bs.dtype),
        jax.ShapeDtypeStruct((dx, dx, Tp), bs.dtype),
        jax.ShapeDtypeStruct((dx, Tp), bs.dtype),
        jax.ShapeDtypeStruct((dx, dx, Tp), bs.dtype),
    )
    out_specs = tuple(spec(s.shape) for s in out_shapes)

    out = pl.pallas_call(
        functools.partial(_elements_kernel, dx=dx, dy=dy, T=_BLOCK),
        grid=(Tp // _BLOCK,),
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        # The per-element update/predict algebra holds tens of (d, d, BLOCK)
        # live temporaries; at d ~ 30 the vector stack passes the default
        # 16 MB scoped limit (25.45 MB measured for the SV T=250 D=30
        # reference shape) — raise it as csmc_fwd does.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return tuple(_ulm(z)[:T] for z in out)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_ell(Fs, Qs, bs, Hs, Rs, cs, ys, ms, Ps, interpret=False):
    """Pallas predict+update log-likelihood increments: (T,) vector."""
    T, dx = bs.shape
    dy = cs.shape[-1]
    Tp = ((T + _BLOCK - 1) // _BLOCK) * _BLOCK

    args = []
    for z, fill in ((Fs, "eye"), (Qs, "eye"), (bs, 0.0), (Hs, 0.0), (Rs, "eye"),
                    (cs, 0.0), (ys, jnp.nan), (ms, 0.0), (Ps, "eye")):
        if Tp != T:
            if fill == "eye":
                d_ = z.shape[-1]
                pad = jnp.broadcast_to(jnp.eye(d_, dtype=z.dtype), (Tp - T, d_, d_))
                z = jnp.concatenate([z, pad], axis=0)
            else:
                z = _pad_lanes(z, Tp, fill)
        args.append(_lm(z))

    def spec(shape):
        if len(shape) == 3:
            return pl.BlockSpec((shape[0], shape[1], _BLOCK), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((shape[0], _BLOCK), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_ell_kernel, dx=dx, dy=dy, T=_BLOCK),
        grid=(Tp // _BLOCK,),
        out_shape=jax.ShapeDtypeStruct((1, Tp), bs.dtype),
        in_specs=[spec(z.shape) for z in args],
        out_specs=pl.BlockSpec((1, _BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        # Same per-element algebra as `fused_make_elements` — same raised
        # scoped-VMEM ceiling for large d (see comment there).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return out[0, :T]


@functools.partial(jax.jit, static_argnames=("reverse", "interpret"))
def fused_affine_scan(gains, incs, reverse=False, interpret=False):
    """Inclusive scan of affine maps (G, e) — equivalent to
    `jax.lax.associative_scan(sampling_operator, (gains, incs), reverse=...)`.
    Reverse scans flip the lane axis around a forward scan (the operator
    convention op(prefix, local) is direction-agnostic)."""
    T, d = incs.shape
    if reverse:
        gains, incs = gains[::-1], incs[::-1]

    Tp = ((T + _BLOCK - 1) // _BLOCK) * _BLOCK
    if Tp != T:
        eyeG = jnp.broadcast_to(jnp.eye(d, dtype=gains.dtype), (Tp - T, d, d))
        gains = jnp.concatenate([gains, eyeG], axis=0)
        incs = _pad_lanes(incs, Tp, 0.0)

    G = _lm(gains)
    e = _lm(incs)
    levels = _BLOCK.bit_length() - 1

    mat_spec = pl.BlockSpec((d, d, _BLOCK), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((d, _BLOCK), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    oG, oe = pl.pallas_call(
        functools.partial(_affine_scan_kernel, d=d, B=_BLOCK, levels=levels),
        grid=(Tp // _BLOCK,),
        out_shape=(jax.ShapeDtypeStruct(G.shape, G.dtype),
                   jax.ShapeDtypeStruct(e.shape, e.dtype)),
        in_specs=[mat_spec, vec_spec],
        out_specs=(mat_spec, vec_spec),
        scratch_shapes=[pltpu.VMEM((d, d, _BLOCK), G.dtype),
                        pltpu.VMEM((d, _BLOCK), e.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(G, e)

    oG, oe = _ulm(oG)[:T], _ulm(oe)[:T]
    if reverse:
        oG, oe = oG[::-1], oe[::-1]
    return oG, oe


# --------------------------------------------------------------------------
# Trajectory log-density contributions (see ops/lgssm.posterior_logpdf)
# --------------------------------------------------------------------------

def _logdensity_kernel(F_ref, Q_ref, b_ref, H_ref, R_ref, c_ref, y_ref,
                       xp_ref, xc_ref, out_ref, *, dx, dy, T):
    """Per-step contribution for t >= 1:
    log N(x_t; F x_{t-1} + b, Q) + masked log N(y_t; H x_t + c, R)."""
    F = ll.mat_from_ref(F_ref, dx, dx, T)
    Q = ll.mat_from_ref(Q_ref, dx, dx, T)
    b = b_ref[:]
    H = ll.mat_from_ref(H_ref, dy, dx, T)
    R = ll.mat_from_ref(R_ref, dy, dy, T)
    c = c_ref[:]
    y = y_ref[:]
    x_prev = xp_ref[:]
    x_cur = xc_ref[:]

    # Transition density.
    Lq, log_det_q = ll.chol(Q, dx, T)
    diff = x_cur - (ll.mat_vec(F, x_prev) + b)
    wq = ll.rows_vec(ll.tri_solve_lower(Lq, ll.vec_rows(diff, dx), dx))
    trans = (-0.5 * jnp.sum(wq * wq, axis=0, keepdims=True)
             - log_det_q - 0.5 * dx * _LOG_2PI)

    # Masked observation density.
    y_eff, H_eff, c_eff, R_eff, mask, fmask = _masked_obs(H, c, R, y, dy, T)
    Lr, log_det_r = ll.chol(R_eff, dy, T)
    innov = jnp.where(mask, y_eff - ll.mat_vec(H_eff, x_cur) - c_eff, 0.0)
    wr = ll.rows_vec(ll.tri_solve_lower(Lr, ll.vec_rows(innov, dy), dy))
    n_obs = jnp.sum(fmask, axis=0, keepdims=True)
    obs = (-0.5 * jnp.sum(wr * wr, axis=0, keepdims=True)
           - log_det_r - 0.5 * n_obs * _LOG_2PI)

    out_ref[:] = trans + obs


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_logdensity_steps(Fs, Qs, bs, Hs, Rs, cs, ys, x_prev, x_cur,
                           interpret=False):
    """(T-1,) per-step contributions of log p(x_t | x_{t-1}) + log p(y_t|x_t)
    for t = 1..T-1; add the t=0 terms at the XLA level."""
    T, dx = bs.shape
    dy = cs.shape[-1]
    Tp = ((T + _BLOCK - 1) // _BLOCK) * _BLOCK

    args = []
    for z, fill in ((Fs, "eye"), (Qs, "eye"), (bs, 0.0), (Hs, 0.0), (Rs, "eye"),
                    (cs, 0.0), (ys, jnp.nan), (x_prev, 0.0), (x_cur, 0.0)):
        if Tp != T:
            if fill == "eye":
                d_ = z.shape[-1]
                pad = jnp.broadcast_to(jnp.eye(d_, dtype=z.dtype), (Tp - T, d_, d_))
                z = jnp.concatenate([z, pad], axis=0)
            else:
                z = _pad_lanes(z, Tp, fill)
        args.append(_lm(z))

    def spec(shape):
        if len(shape) == 3:
            return pl.BlockSpec((shape[0], shape[1], _BLOCK), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((shape[0], _BLOCK), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_logdensity_kernel, dx=dx, dy=dy, T=_BLOCK),
        grid=(Tp // _BLOCK,),
        out_shape=jax.ShapeDtypeStruct((1, Tp), bs.dtype),
        in_specs=[spec(z.shape) for z in args],
        out_specs=pl.BlockSpec((1, _BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        # Same per-element algebra as `fused_make_elements` — same raised
        # scoped-VMEM ceiling for large d (see comment there).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return out[0, :T]


# --------------------------------------------------------------------------
# Backward-sampling map construction (see ops/sampling.backward_map_moments)
# --------------------------------------------------------------------------

def _backward_maps_kernel(F_ref, Q_ref, b_ref, m_ref, P_ref, eps_ref,
                          G_ref, inc_ref, *, dx, T):
    F = ll.mat_from_ref(F_ref, dx, dx, T)
    Q = ll.mat_from_ref(Q_ref, dx, dx, T)
    b = b_ref[:]
    m = m_ref[:]
    P = ll.mat_from_ref(P_ref, dx, dx, T)
    eps = eps_ref[:]

    FT = ll.mat_transpose(F)
    S = ll.mat_sym(ll.mat_add(ll.mat_mul(F, ll.mat_mul(P, FT)), Q))
    FP = ll.mat_mul(F, P)
    SinvFP, _ = ll.spd_solve(S, FP, dx, T)
    gain = ll.mat_transpose(SinvFP)                # P F^T S^{-1}

    cov = ll.mat_sym(ll.mat_sub(P, ll.mat_mul(gain, ll.mat_mul(S,
                                    ll.mat_transpose(gain)))))
    # Jittered Cholesky for (possibly singular) conditional covariance:
    # mirror ops/chol.safe_cholesky (relative jitter, NaN -> 0).
    trace = cov[0] * 0.0
    for i in range(dx):
        trace = trace + ll.ent(cov[i], i)
    jitter = (32.0 * float(jnp.finfo(b.dtype).eps) / dx) * trace
    lane_eye = ll.mat_eye(dx, T, b.dtype)
    cov = [cov[i] + lane_eye[i] * jitter for i in range(dx)]
    L, _ = ll.chol(cov, dx, T)
    L = [jnp.nan_to_num(r, nan=0.0, posinf=0.0, neginf=0.0) for r in L]

    inc_m = m - ll.mat_vec(gain, ll.mat_vec(F, m) + b)
    inc = inc_m + ll.mat_vec(L, eps)

    ll.mat_to_ref(G_ref, gain, dx, T)
    inc_ref[:] = inc


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_backward_maps(Fs, Qs, bs, ms, Ps, eps, interpret=False):
    """Backward-sampling gains and noise-carrying increments for steps
    0..T-2 (the last step is handled at the XLA level)."""
    T, dx = bs.shape
    Tp = ((T + _BLOCK - 1) // _BLOCK) * _BLOCK

    args = []
    for z, fill in ((Fs, "eye"), (Qs, "eye"), (bs, 0.0), (ms, 0.0),
                    (Ps, "eye"), (eps, 0.0)):
        if Tp != T:
            if fill == "eye":
                d_ = z.shape[-1]
                pad = jnp.broadcast_to(jnp.eye(d_, dtype=z.dtype), (Tp - T, d_, d_))
                z = jnp.concatenate([z, pad], axis=0)
            else:
                z = _pad_lanes(z, Tp, fill)
        args.append(_lm(z))

    def spec(shape):
        if len(shape) == 3:
            return pl.BlockSpec((shape[0], shape[1], _BLOCK), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((shape[0], _BLOCK), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    G, inc = pl.pallas_call(
        functools.partial(_backward_maps_kernel, dx=dx, T=_BLOCK),
        grid=(Tp // _BLOCK,),
        out_shape=(jax.ShapeDtypeStruct((dx, dx, Tp), bs.dtype),
                   jax.ShapeDtypeStruct((dx, Tp), bs.dtype)),
        in_specs=[spec(z.shape) for z in args],
        out_specs=(spec((dx, dx, Tp)), spec((dx, Tp))),
        interpret=interpret,
    )(*args)
    return _ulm(G)[:T], _ulm(inc)[:T]
