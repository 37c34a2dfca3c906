"""Fused cSMC forward sweep for independent-proposal particle Gibbs.

Covers the hot loop of the sequential auxiliary cSMC family (reference
`_primitives/csmc/csmc.py:69-107` run through independent proposals,
`csmc/independent.py`): T-1 steps of conditional-multinomial resampling,
(optional PGAS) ancestor redraw, and reweighting.

Why this can be a pure index/weight kernel
------------------------------------------
With *independent* per-step proposals, resampling permutes particle indices
but never changes the particle VALUES at a step: slot j at time t always
holds the precomputed proposal xs[t, j]. When the step weight additionally
pair-factorises (`AbsorbedGt.pairwise_factors`: Gaussian transition +
prev-independent potential),

    log_w_t[j] = col[t, j] + row_bias[t, anc[j]] + row_feat[t, anc[j]] . col_feat[t, j]

every model evaluation becomes a precomputed tensor (row/col features over
the FIXED proposal sets), and the sequential dependence reduces to weight
normalisation + categorical index draws. The Pallas kernel runs the whole
T-1-step recursion in one launch: particles ride the 128-wide lanes,
resampling is a cumsum-matmul + threshold count, gathers are one-hot
matmuls — no XLA while-loop overhead, no HBM round-trips for the carry.

The same algebra is provided as an XLA `lax.scan` (`factor_scan_xla`) used
as the non-TPU fallback and as the oracle in tests. Both consume the same
hoisted uniforms/noise, so the fused path is a drop-in for the generic scan
(same key stream, same law).

Mosaic notes: transposes of (1, N) <-> (N, 1) are done as masked diagonal
reductions; all broadcasts are single-sided (see project memory on the
dual-broadcast miscompile); counts/indices stay in f32 (exact below 2^24).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_slice = jax.lax.slice_in_dim


def _col_from_row(x_row, N):
    """(1, N) -> (N, 1). A plain relayout transpose: current Mosaic compiles
    `swapaxes` fine, while the old masked-diagonal-reduction workaround's
    (1, n) -> (n, n) sublane broadcast of a lane *slice* is rejected
    ("Invalid input layout" on vector.broadcast)."""
    del N
    return jnp.swapaxes(x_row, 0, 1)


def _row_from_col(x_col, N):
    del N
    return jnp.swapaxes(x_col, 0, 1)


# --------------------------------------------------------------------------
# Chunked large-N primitives: the dense kernel's (N, N) iota masks /
# cumsum-matmul / one-hot gathers outgrow VMEM past N = 1024. These keep at
# most a (128, N) tile live: the cumsum is a shift-add (Hillis-Steele) over
# the lane axis, and the transpose / rank-count / gather walk the N sources
# in 128-wide chunks (one (128, 128) masked-diagonal transpose + one
# (1, 128) x (128, N) matmul per chunk).
# --------------------------------------------------------------------------

_DENSE_MAX_N = 1024
_CHUNK = 128
# Max output elements per lane_forward_scan launch (see its docstring):
# 3 f32 outputs x seg x N stay well under the 16 MB scoped-VMEM limit.
_LANE_SEG_ELEMS = 128 * 4096


def _cumsum_lanes(x, N):
    """Inclusive cumsum over the lane axis of a (1, N) row (shift-add)."""
    ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    sh = 1
    while sh < N:
        x = x + jnp.where(ids >= sh, pltpu.roll(x, sh, axis=x.ndim - 1),
                          jnp.zeros_like(x))
        sh *= 2
    return x


def _rank_count_chunked(cw, u, N):
    """anc[j] = #{i : cw[i] < u[j]} for (1, N) rows, chunked over sources.
    Chunks are static lane slices of the (1, N) row (no in-kernel lane
    regrouping); each chunk is transposed to a column via one (128, 128)
    masked-diagonal reduction."""
    f32 = jnp.float32
    nch = N // _CHUNK
    U = jnp.broadcast_to(u, (_CHUNK, N))
    ones = jnp.ones((1, _CHUNK), f32)
    anc = jnp.zeros((1, N), f32)
    for b in range(nch):
        row_b = _slice(cw, b * _CHUNK, (b + 1) * _CHUNK, axis=1)  # (1, 128)
        col_b = jnp.swapaxes(row_b, 0, 1)                         # (128, 1)
        lt = (jnp.broadcast_to(col_b, (_CHUNK, N)) < U).astype(f32)
        anc = anc + jax.lax.dot_general(ones, lt, (((1,), (0,)), ((), ())),
                                        preferred_element_type=f32,
                             precision=jax.lax.Precision.HIGHEST)
    return anc


def _gather_rows_chunked(mat, anc, N):
    """out[:, j] = mat[:, anc[j]] for an (m, N) row stack (anc f32 indices
    in a (1, N) row), chunked one-hot: one (m, 128) x (128, N) matmul per
    128-source chunk, all m payload rows gathered in the same pass."""
    f32 = jnp.float32
    m = mat.shape[0]
    nch = N // _CHUNK
    io_s = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, N), 0).astype(f32)
    ancb = jnp.broadcast_to(anc, (_CHUNK, N))
    out = jnp.zeros((m, N), f32)
    for b in range(nch):
        blk = _slice(mat, b * _CHUNK, (b + 1) * _CHUNK, axis=1)  # (m, 128)
        oh = (ancb == io_s + f32(b * _CHUNK)).astype(f32)        # (128, N)
        out = out + jax.lax.dot_general(blk, oh, (((1,), (0,)), ((), ())),
                                        preferred_element_type=f32,
                             precision=jax.lax.Precision.HIGHEST)
    return out


def _fwd_kernel(rf_ref, cf_ref, rb_ref, cb_ref, u_ref, ua_ref, w0_ref,
                logw_ref, anc_ref, w_scr, *, N, k, pgas):
    t = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(t == 0)
    def _():
        w_scr[:] = w0_ref[:]

    w = w_scr[:]                       # (1, N) normalised weights at t-1
    u = u_ref[0]                       # (1, N) resampling uniforms
    rf = rf_ref[0]                     # (N, k)
    cf = cf_ref[0]                     # (N, k)
    rb = rb_ref[0]                     # (1, N)
    cb = cb_ref[0]                     # (1, N)

    io0 = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    io1 = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    LT = (io0 <= io1).astype(f32)

    # Conditional multinomial: anc[j] = #{i : cumsum(w)[i] < u[j]}, lane 0
    # pinned (the law of `resampling.multinomial_from_uniforms`).
    cw = jax.lax.dot_general(w, LT, (((1,), (0,)), ((), ())),
                             preferred_element_type=f32,
                             precision=jax.lax.Precision.HIGHEST)          # (1, N)
    cw_col = _col_from_row(cw, N)
    lt_mask = (jnp.broadcast_to(cw_col, (N, N))
               < jnp.broadcast_to(u, (N, N))).astype(f32)
    anc = jax.lax.dot_general(jnp.ones((1, N), f32), lt_mask,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=f32,
                             precision=jax.lax.Precision.HIGHEST)         # (1, N)
    anc = jnp.minimum(anc, f32(N - 1))

    if pgas:
        # PGAS ancestor redraw for the reference lane: categorical over
        # log w + logpdf(x*_t | x_prev_i); x*_t sits in proposal slot 0, so
        # its column factors are row 0 of cf/cb.
        cf0 = _slice(cf, 0, 1, axis=0)                            # (1, k)
        sA = jnp.sum(rf * jnp.broadcast_to(cf0, (N, k)),
                     axis=1, keepdims=True)                       # (N, 1)
        scoreA = jnp.log(jnp.maximum(w, 1e-37)) + rb + _row_from_col(sA, N)
        mA = jnp.max(scoreA, axis=1, keepdims=True)
        wA = jnp.exp(scoreA - mA)
        cwA = jax.lax.dot_general(wA, LT, (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32,
                             precision=jax.lax.Precision.HIGHEST)
        ua = _slice(ua_ref[0], 0, 1, axis=1)                      # (1, 1)
        thresh = ua * _slice(cwA, N - 1, N, axis=1)
        a0 = jnp.sum((cwA < jnp.broadcast_to(thresh, (1, N))).astype(f32),
                     axis=1, keepdims=True)
        a0 = jnp.minimum(a0, f32(N - 1))
        anc = jnp.where(lane == 0, jnp.broadcast_to(a0, (1, N)), anc)
    else:
        anc = jnp.where(lane == 0, f32(0.0), anc)

    # One-hot gathers of the ancestor rows' factors.
    ancb = jnp.broadcast_to(anc, (N, N))
    O = (io0.astype(f32) == ancb).astype(f32)                     # O[i,j]=[anc_j=i]
    rb_g = jax.lax.dot_general(rb, O, (((1,), (0,)), ((), ())),
                               preferred_element_type=f32,
                             precision=jax.lax.Precision.HIGHEST)        # (1, N)
    anc_col = _col_from_row(anc, N)
    OT = (jnp.broadcast_to(anc_col, (N, N)) == io1.astype(f32)).astype(f32)
    rf_g = jax.lax.dot_general(OT, rf, (((1,), (0,)), ((), ())),
                               preferred_element_type=f32,
                             precision=jax.lax.Precision.HIGHEST)        # (N, k)

    s_col = jnp.sum(rf_g * cf, axis=1, keepdims=True)             # (N, 1)
    log_w = cb + rb_g + _row_from_col(s_col, N)                   # (1, N)

    logw_ref[0] = log_w
    anc_ref[0] = anc

    mW = jnp.max(log_w, axis=1, keepdims=True)
    wn = jnp.exp(log_w - mW)
    w_scr[:] = wn / jnp.sum(wn, axis=1, keepdims=True)


def _fwd_kernel_chunked(rf_ref, cf_ref, rb_ref, cb_ref, u_ref, ua_ref,
                        w0_ref, logw_ref, anc_ref, w_scr, *, N, k, pgas):
    """Large-N factor kernel: rf/cf arrive transposed as (k, N) row stacks
    so every per-particle quantity is a (1, N) lane row — no (N, N)
    intermediates (shift-add cumsum, 128-chunk rank count and gathers)."""
    t = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(t == 0)
    def _():
        w_scr[:] = w0_ref[:]

    w = w_scr[:]
    u = u_ref[0]
    rf2 = rf_ref[0]                    # (k, N)
    cf2 = cf_ref[0]                    # (k, N)
    rb = rb_ref[0]                     # (1, N)
    cb = cb_ref[0]                     # (1, N)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)

    cw = _cumsum_lanes(w, N)
    anc = jnp.minimum(_rank_count_chunked(cw, u, N), f32(N - 1))

    if pgas:
        sA = jnp.zeros((1, N), f32)
        for kk in range(k):
            rfk = _slice(rf2, kk, kk + 1, axis=0)             # (1, N)
            cf0k = _slice(_slice(cf2, kk, kk + 1, axis=0), 0, 1, axis=1)
            sA = sA + rfk * jnp.broadcast_to(cf0k, (1, N))
        scoreA = jnp.log(jnp.maximum(w, 1e-37)) + rb + sA
        mA = jnp.max(scoreA, axis=1, keepdims=True)
        wA = jnp.exp(scoreA - mA)
        cwA = _cumsum_lanes(wA, N)
        ua = _slice(ua_ref[0], 0, 1, axis=1)
        thresh = ua * _slice(cwA, N - 1, N, axis=1)
        a0 = jnp.sum((cwA < jnp.broadcast_to(thresh, (1, N))).astype(f32),
                     axis=1, keepdims=True)
        a0 = jnp.minimum(a0, f32(N - 1))
        anc = jnp.where(lane == 0, jnp.broadcast_to(a0, (1, N)), anc)
    else:
        anc = jnp.where(lane == 0, f32(0.0), anc)

    # rb and the k rf rows gathered in one chunked pass.
    payload = jnp.concatenate([rb, rf2], axis=0)               # (1+k, N)
    g = _gather_rows_chunked(payload, anc, N)
    log_w = cb + _slice(g, 0, 1, axis=0)
    for kk in range(k):
        log_w = log_w + (_slice(g, 1 + kk, 2 + kk, axis=0)
                         * _slice(cf2, kk, kk + 1, axis=0))

    logw_ref[0] = log_w
    anc_ref[0] = anc

    mW = jnp.max(log_w, axis=1, keepdims=True)
    wn = jnp.exp(log_w - mW)
    w_scr[:] = wn / jnp.sum(wn, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("pgas", "interpret"))
def fused_forward_scan(rf, cf, rb, cb, res_u, anc_u, w0, pgas=False,
                       interpret=False):
    """Run the T-1-step cSMC index/weight recursion in one Pallas launch.

    rf, cf : (T-1, N, k) pair factors (rows = time-(t-1) particles, cols =
        time-t particles); rb, cb : (T-1, N) biases (cb includes potential +
        proposal correction); res_u : (T-1, N) resampling uniforms; anc_u :
        (T-1,) PGAS uniforms; w0 : (N,) normalised initial weights.

    Returns (log_ws (T-1, N), ancestors (T-1, N) int32).
    """
    Tm1, N, k = rf.shape
    f32 = jnp.float32
    row = lambda z: z[:, None, :].astype(f32)                     # (T-1, 1, N)
    ua = jnp.broadcast_to(anc_u[:, None, None], (Tm1, 1, N)).astype(f32)

    chunked = N > _DENSE_MAX_N
    if chunked:
        # Row layout (k, N): the chunked kernel works entirely on lane rows.
        rf_in = jnp.swapaxes(rf, 1, 2).astype(f32)                # (T-1, k, N)
        cf_in = jnp.swapaxes(cf, 1, 2).astype(f32)
        mat_spec = pl.BlockSpec((1, k, N), lambda t: (t, 0, 0),
                                memory_space=pltpu.VMEM)
        body = functools.partial(_fwd_kernel_chunked, N=N, k=k, pgas=pgas)
    else:
        rf_in, cf_in = rf.astype(f32), cf.astype(f32)
        mat_spec = pl.BlockSpec((1, N, k), lambda t: (t, 0, 0),
                                memory_space=pltpu.VMEM)
        body = functools.partial(_fwd_kernel, N=N, k=k, pgas=pgas)
    row_spec = pl.BlockSpec((1, 1, N), lambda t: (t, 0, 0),
                            memory_space=pltpu.VMEM)
    w0_spec = pl.BlockSpec((1, N), lambda t: (0, 0), memory_space=pltpu.VMEM)

    log_ws, anc = pl.pallas_call(
        body,
        grid=(Tm1,),
        in_specs=[mat_spec, mat_spec, row_spec, row_spec, row_spec, row_spec,
                  w0_spec],
        out_specs=(row_spec, row_spec),
        out_shape=(jax.ShapeDtypeStruct((Tm1, 1, N), f32),
                   jax.ShapeDtypeStruct((Tm1, 1, N), f32)),
        scratch_shapes=[pltpu.VMEM((1, N), f32)],
        interpret=interpret,
    )(rf_in, cf_in, row(rb), row(cb), row(res_u), ua,
      w0[None].astype(f32))
    return log_ws[:, 0], anc[:, 0].astype(jnp.int32)


def factor_scan_xla(rf, cf, rb, cb, res_u, anc_u, w0, pgas=False):
    """XLA reference/fallback of `fused_forward_scan` — same algebra, same
    uniforms, implemented as a `lax.scan` (used on CPU and in tests)."""
    N = rf.shape[1]

    def body(w, inp):
        rf_t, cf_t, rb_t, cb_t, u_t, ua_t = inp
        cw = jnp.cumsum(w)
        anc = jnp.searchsorted(cw, u_t).astype(jnp.int32)
        anc = jnp.clip(anc, 0, N - 1)
        if pgas:
            scoreA = jnp.log(jnp.maximum(w, 1e-37)) + rb_t + jnp.matmul(rf_t, cf_t[0], precision=jax.lax.Precision.HIGHEST)
            wA = jnp.exp(scoreA - jnp.max(scoreA))
            cwA = jnp.cumsum(wA)
            a0 = jnp.sum(cwA < ua_t * cwA[-1]).astype(jnp.int32)
            anc = anc.at[0].set(jnp.clip(a0, 0, N - 1))
        else:
            anc = anc.at[0].set(0)
        log_w = cb_t + rb_t[anc] + jnp.sum(rf_t[anc] * cf_t, axis=-1)
        wn = jnp.exp(log_w - jnp.max(log_w))
        return wn / jnp.sum(wn), (log_w, anc)

    _, (log_ws, anc) = jax.lax.scan(body, w0, (rf, cf, rb, cb, res_u, anc_u))
    return log_ws, anc


# --------------------------------------------------------------------------
# Backward (Whiteley) sampling pass
# --------------------------------------------------------------------------

def _bwd_kernel(rf_ref, cf_ref, rb_ref, lw_ref, u_ref, b0_ref,
                out_ref, bh_scr, *, N, k):
    """One reverse step: categorical over log_w_t[i] + logpdf(x_sel | x_i),
    with the selected next particle entering through its column factors."""
    t = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(t == 0)
    def _():
        bh_scr[:] = b0_ref[:]

    bh = bh_scr[:]                     # (1, N) one-hot of B_{s+1}
    rf = rf_ref[0]                     # (N, k)
    cf = cf_ref[0]                     # (N, k)
    rb = rb_ref[0]                     # (1, N)
    lw = lw_ref[0]                     # (1, N)
    u = _slice(u_ref[0], 0, 1, axis=1)  # (1, 1)

    io0 = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    io1 = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    LT = (io0 <= io1).astype(f32)

    cf_sel = jax.lax.dot_general(bh, cf, (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32,
                             precision=jax.lax.Precision.HIGHEST)      # (1, k)
    s_col = jnp.sum(rf * jnp.broadcast_to(cf_sel, (N, k)),
                    axis=1, keepdims=True)                        # (N, 1)
    score = lw + rb + _row_from_col(s_col, N)                     # (1, N)

    m = jnp.max(score, axis=1, keepdims=True)
    w = jnp.exp(score - m)
    cw = jax.lax.dot_general(w, LT, (((1,), (0,)), ((), ())),
                             preferred_element_type=f32,
                             precision=jax.lax.Precision.HIGHEST)
    thresh = u * _slice(cw, N - 1, N, axis=1)
    B = jnp.sum((cw < jnp.broadcast_to(thresh, (1, N))).astype(f32),
                axis=1, keepdims=True)
    B = jnp.minimum(B, f32(N - 1))

    out_ref[0] = jnp.broadcast_to(B, (1, N))
    bh_scr[:] = (lane.astype(f32) == jnp.broadcast_to(B, (1, N))).astype(f32)


def _bwd_kernel_chunked(rf_ref, cf_ref, rb_ref, lw_ref, u_ref, b0_ref,
                        out_ref, bh_scr, *, N, k):
    """Large-N backward step in (k, N) row layout — the selected next
    particle's column factors reduce against the one-hot row elementwise,
    so nothing here is bigger than a (1, N) lane row."""
    t = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(t == 0)
    def _():
        bh_scr[:] = b0_ref[:]

    bh = bh_scr[:]                     # (1, N) one-hot of B_{s+1}
    rf2 = rf_ref[0]                    # (k, N)
    cf2 = cf_ref[0]                    # (k, N)
    rb = rb_ref[0]
    lw = lw_ref[0]
    u = _slice(u_ref[0], 0, 1, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)

    score = lw + rb
    for kk in range(k):
        cfk = _slice(cf2, kk, kk + 1, axis=0)
        sel_k = jnp.sum(bh * cfk, axis=1, keepdims=True)      # (1, 1)
        score = score + (_slice(rf2, kk, kk + 1, axis=0)
                         * jnp.broadcast_to(sel_k, (1, N)))

    m = jnp.max(score, axis=1, keepdims=True)
    w = jnp.exp(score - m)
    cw = _cumsum_lanes(w, N)
    thresh = u * _slice(cw, N - 1, N, axis=1)
    B = jnp.sum((cw < jnp.broadcast_to(thresh, (1, N))).astype(f32),
                axis=1, keepdims=True)
    B = jnp.minimum(B, f32(N - 1))

    out_ref[0] = jnp.broadcast_to(B, (1, N))
    bh_scr[:] = (lane.astype(f32) == jnp.broadcast_to(B, (1, N))).astype(f32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_backward_scan(rf, cf, rb, log_ws, us, b_T, interpret=False):
    """Whiteley backward sampling as one reverse Pallas launch.

    rf, cf : (T-1, N, k) factors of Pt.logpdf (rows = time-t particles,
        cols = time-(t+1)); rb : (T-1, N) row bias; log_ws : (T-1, N)
        forward log-weights at steps 0..T-2; us : (T-1,) uniforms;
    b_T : int32 index drawn at the last step. Returns picked (T-1,) int32
    (indices at steps 0..T-2).
    """
    Tm1, N, k = rf.shape
    f32 = jnp.float32
    row = lambda z: z[:, None, :].astype(f32)
    u_rows = jnp.broadcast_to(us[:, None, None], (Tm1, 1, N)).astype(f32)
    b0 = (jnp.arange(N) == b_T).astype(f32)[None]

    rev = lambda t: (Tm1 - 1 - t, 0, 0)
    chunked = N > _DENSE_MAX_N
    if chunked:
        rf_in = jnp.swapaxes(rf, 1, 2).astype(f32)            # (T-1, k, N)
        cf_in = jnp.swapaxes(cf, 1, 2).astype(f32)
        mat_spec = pl.BlockSpec((1, k, N), rev, memory_space=pltpu.VMEM)
        body = functools.partial(_bwd_kernel_chunked, N=N, k=k)
    else:
        rf_in, cf_in = rf.astype(f32), cf.astype(f32)
        mat_spec = pl.BlockSpec((1, N, k), rev, memory_space=pltpu.VMEM)
        body = functools.partial(_bwd_kernel, N=N, k=k)
    row_spec = pl.BlockSpec((1, 1, N), rev, memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, N), rev, memory_space=pltpu.VMEM)
    b0_spec = pl.BlockSpec((1, N), lambda t: (0, 0), memory_space=pltpu.VMEM)

    picked = pl.pallas_call(
        body,
        grid=(Tm1,),
        in_specs=[mat_spec, mat_spec, row_spec, row_spec, row_spec, b0_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Tm1, 1, N), f32),
        scratch_shapes=[pltpu.VMEM((1, N), f32)],
        interpret=interpret,
    )(rf_in, cf_in, row(rb), row(log_ws), u_rows, b0)
    return picked[:, 0, 0].astype(jnp.int32)


def backward_factor_scan_xla(rf, cf, rb, log_ws, us, b_T):
    """XLA reference/fallback of `fused_backward_scan` (same algebra)."""
    def body(b_next, inp):
        rf_t, cf_t, rb_t, lw_t, u_t = inp
        score = lw_t + rb_t + jnp.matmul(rf_t, cf_t[b_next], precision=jax.lax.Precision.HIGHEST)
        w = jnp.exp(score - jnp.max(score))
        cw = jnp.cumsum(w)
        b = jnp.sum(cw < u_t * cw[-1]).astype(jnp.int32)
        b = jnp.clip(b, 0, rf_t.shape[0] - 1)
        return b, b

    _, picked = jax.lax.scan(body, b_T, (rf, cf, rb, log_ws, us), reverse=True)
    return picked


# --------------------------------------------------------------------------
# Lane-callable forward sweep (bootstrap / state-dependent proposals, d = 1)
# --------------------------------------------------------------------------
#
# When proposals DO depend on the previous state (bootstrap particle
# filters), particle values follow the genealogy and cannot be precomputed.
# For scalar-state models whose dynamics/potentials are elementwise jnp code
# (every 1-D model in this repo), the model itself can run inside the
# kernel: particles ride the lanes as (1, N) rows and the model's
# `lane_propagate` / `lane_logw` / `lane_logpdf` callables are traced into
# the Mosaic kernel (exp/log/mul — all VPU ops). Per-step params arrive as
# (T-1, 1, N) broadcast rows; zero-size param leaves are replaced by ()
# zeros (models with lane callables ignore them by construction).

def _flatten_params(params, Tm1, N):
    leaves, treedef = jax.tree.flatten(params)
    arrays, mask = [], []
    for z in leaves:
        if z.size == 0:
            mask.append(False)
            continue
        mask.append(True)
        row = z.reshape(Tm1, -1)[:, :1]      # d = 1: one value per step
        arrays.append(jnp.broadcast_to(row[:, None, :], (Tm1, 1, N))
                      .astype(jnp.float32))
    return arrays, (treedef, mask)


def _unflatten_params(refs_or_rows, spec):
    treedef, mask = spec
    it = iter(refs_or_rows)
    leaves = [next(it) if m else jnp.zeros(()) for m in mask]
    return jax.tree.unflatten(treedef, leaves)


def _lane_fwd_kernel(*refs, propagate, logw, pgas_logpdf, spec_m, spec_g,
                     spec_p, n_m, n_g, n_p, N, pgas):
    (eps_ref, u_ref, ua_ref, xstar_ref, x0_ref, w0_ref) = refs[:6]
    pr = refs[6:6 + n_m + n_g + n_p]
    logw_ref, anc_ref, xs_ref = refs[6 + n_m + n_g + n_p:
                                     9 + n_m + n_g + n_p]
    x_scr, w_scr = refs[9 + n_m + n_g + n_p:]

    t = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(t == 0)
    def _():
        x_scr[:] = x0_ref[:]
        w_scr[:] = w0_ref[:]

    x_prev = x_scr[:]                   # (1, N)
    w = w_scr[:]
    u = u_ref[0]
    eps = eps_ref[0]
    x_star = xstar_ref[0]

    mt_p = _unflatten_params([r[0] for r in pr[:n_m]], spec_m)
    gt_p = _unflatten_params([r[0] for r in pr[n_m:n_m + n_g]], spec_g)
    pt_p = _unflatten_params([r[0] for r in pr[n_m + n_g:]], spec_p)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    dense = N <= _DENSE_MAX_N

    if dense:
        io0 = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
        io1 = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
        LT = (io0 <= io1).astype(f32)
        cw = jax.lax.dot_general(w, LT, (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32,
                             precision=jax.lax.Precision.HIGHEST)
        cw_col = _col_from_row(cw, N)
        lt_mask = (jnp.broadcast_to(cw_col, (N, N))
                   < jnp.broadcast_to(u, (N, N))).astype(f32)
        anc = jax.lax.dot_general(jnp.ones((1, N), f32), lt_mask,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32,
                             precision=jax.lax.Precision.HIGHEST)
    else:
        cw = _cumsum_lanes(w, N)
        anc = _rank_count_chunked(cw, u, N)
    anc = jnp.minimum(anc, f32(N - 1))

    if pgas:
        scoreA = jnp.log(jnp.maximum(w, 1e-37)) + pgas_logpdf(x_star, x_prev, pt_p)
        mA = jnp.max(scoreA, axis=1, keepdims=True)
        wA = jnp.exp(scoreA - mA)
        if dense:
            cwA = jax.lax.dot_general(wA, LT, (((1,), (0,)), ((), ())),
                                      preferred_element_type=f32,
                             precision=jax.lax.Precision.HIGHEST)
        else:
            cwA = _cumsum_lanes(wA, N)
        ua = _slice(ua_ref[0], 0, 1, axis=1)
        thresh = ua * _slice(cwA, N - 1, N, axis=1)
        a0 = jnp.sum((cwA < jnp.broadcast_to(thresh, (1, N))).astype(f32),
                     axis=1, keepdims=True)
        a0 = jnp.minimum(a0, f32(N - 1))
        anc = jnp.where(lane == 0, jnp.broadcast_to(a0, (1, N)), anc)
    else:
        anc = jnp.where(lane == 0, f32(0.0), anc)

    if dense:
        ancb = jnp.broadcast_to(anc, (N, N))
        O = (io0.astype(f32) == ancb).astype(f32)
        x_res = jax.lax.dot_general(x_prev, O, (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32,
                             precision=jax.lax.Precision.HIGHEST)  # (1, N)
    else:
        x_res = _gather_rows_chunked(x_prev, anc, N)

    x_t = propagate(eps, x_res, mt_p)
    x_t = jnp.where(lane == 0, x_star, x_t)
    log_w = logw(x_t, x_res, gt_p)

    logw_ref[0] = log_w
    anc_ref[0] = anc
    xs_ref[0] = x_t

    mW = jnp.max(log_w, axis=1, keepdims=True)
    wn = jnp.exp(log_w - mW)
    w_scr[:] = wn / jnp.sum(wn, axis=1, keepdims=True)
    x_scr[:] = x_t


def lane_forward_scan(propagate, logw, pgas_logpdf, mt_params, gt_params,
                      pt_params, eps, res_u, anc_u, x_star, x0, w0,
                      interpret=False):
    """Bootstrap cSMC forward sweep with in-kernel model callables (d = 1).

    propagate(eps, x_prev, mt_params) / logw(x_next, x_prev, gt_params) /
    pgas_logpdf(x_star, x_prev, pt_params) operate on (1, N) lane rows.
    eps, res_u : (T-1, N); anc_u, x_star : (T-1,); x0, w0 : (N,).
    Returns (xs (T-1, N), log_ws (T-1, N), ancestors (T-1, N) int32).

    Long sweeps are segmented over T (`_LANE_SEG_ELEMS` output elements per
    launch): XLA's memory-space assignment may pin a whole (T-1, 1, N)
    output in VMEM, which blows the 16 MB scoped limit at T=1024, N=4096.
    The carry between segments is (last x, softmax(last log_w)) — exactly
    the kernel's own scratch carry, so segmentation is bitwise-neutral.
    """
    Tm1, N = res_u.shape
    f32 = jnp.float32
    pgas = pgas_logpdf is not None

    seg = max(1, _LANE_SEG_ELEMS // N)
    if Tm1 > seg:
        outs, start = [], 0
        x_c, w_c = x0, w0
        while start < Tm1:
            stop = min(start + seg, Tm1)
            sl = lambda z: z[start:stop]
            o = lane_forward_scan(
                propagate, logw, pgas_logpdf,
                jax.tree.map(sl, mt_params), jax.tree.map(sl, gt_params),
                jax.tree.map(sl, pt_params) if pgas else pt_params,
                sl(eps), sl(res_u), sl(anc_u), sl(x_star), x_c, w_c,
                interpret=interpret)
            outs.append(o)
            x_c = o[0][-1]
            lw_last = o[1][-1]
            wn = jnp.exp(lw_last - jnp.max(lw_last))
            w_c = wn / jnp.sum(wn)
            start = stop
        return tuple(jnp.concatenate([o[i] for o in outs], axis=0)
                     for i in range(3))

    m_arr, spec_m = _flatten_params(mt_params, Tm1, N)
    g_arr, spec_g = _flatten_params(gt_params, Tm1, N)
    p_arr, spec_p = _flatten_params(pt_params if pgas else None, Tm1, N)

    row = lambda z: z[:, None, :].astype(f32)
    ua = jnp.broadcast_to(anc_u[:, None, None], (Tm1, 1, N)).astype(f32)
    xstar = jnp.broadcast_to(x_star[:, None, None], (Tm1, 1, N)).astype(f32)

    row_spec = pl.BlockSpec((1, 1, N), lambda t: (t, 0, 0),
                            memory_space=pltpu.VMEM)
    init_spec = pl.BlockSpec((1, N), lambda t: (0, 0), memory_space=pltpu.VMEM)

    n_m, n_g, n_p = len(m_arr), len(g_arr), len(p_arr)
    kernel = functools.partial(
        _lane_fwd_kernel, propagate=propagate, logw=logw,
        pgas_logpdf=pgas_logpdf, spec_m=spec_m, spec_g=spec_g, spec_p=spec_p,
        n_m=n_m, n_g=n_g, n_p=n_p, N=N, pgas=pgas)

    outs = pl.pallas_call(
        kernel,
        grid=(Tm1,),
        in_specs=[row_spec] * 4 + [init_spec, init_spec]
                 + [row_spec] * (n_m + n_g + n_p),
        out_specs=(row_spec, row_spec, row_spec),
        out_shape=(jax.ShapeDtypeStruct((Tm1, 1, N), f32),
                   jax.ShapeDtypeStruct((Tm1, 1, N), f32),
                   jax.ShapeDtypeStruct((Tm1, 1, N), f32)),
        scratch_shapes=[pltpu.VMEM((1, N), f32), pltpu.VMEM((1, N), f32)],
        # The chunked rank-count/gather working set at N = 4096 peaks ~23 MB
        # of vector stack — above the 16 MB default scoped-VMEM budget but
        # comfortably inside the 128 MB physical VMEM of a v5e core.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(row(eps), row(res_u), ua, xstar, x0[None].astype(f32),
      w0[None].astype(f32), *m_arr, *g_arr, *p_arr)
    log_ws, anc, xs_out = outs
    return (xs_out[:, 0], log_ws[:, 0], anc[:, 0].astype(jnp.int32))


def lane_scan_xla(propagate, logw, pgas_logpdf, mt_params, gt_params,
                  pt_params, eps, res_u, anc_u, x_star, x0, w0):
    """XLA reference/fallback of `lane_forward_scan` (same algebra, same
    (1, N) lane-row calling convention for the model callables)."""
    Tm1, N = res_u.shape
    pgas = pgas_logpdf is not None
    m_arr, spec_m = _flatten_params(mt_params, Tm1, N)
    g_arr, spec_g = _flatten_params(gt_params, Tm1, N)
    p_arr, spec_p = _flatten_params(pt_params if pgas else None, Tm1, N)

    def body(carry, inp):
        x_prev, w = carry
        eps_t, u_t, ua_t, xst, rows = inp
        m_rows = rows[:len(m_arr)]
        g_rows = rows[len(m_arr):len(m_arr) + len(g_arr)]
        p_rows = rows[len(m_arr) + len(g_arr):]
        mt_p = _unflatten_params(list(m_rows), spec_m)
        gt_p = _unflatten_params(list(g_rows), spec_g)
        pt_p = _unflatten_params(list(p_rows), spec_p)

        cw = jnp.cumsum(w[0])
        anc = jnp.clip(jnp.searchsorted(cw, u_t[0]), 0, N - 1).astype(jnp.int32)
        if pgas:
            scoreA = jnp.log(jnp.maximum(w, 1e-37)) + pgas_logpdf(xst, x_prev, pt_p)
            wA = jnp.exp(scoreA - jnp.max(scoreA))[0]
            cwA = jnp.cumsum(wA)
            a0 = jnp.clip(jnp.sum(cwA < ua_t[0, 0] * cwA[-1]), 0, N - 1)
            anc = anc.at[0].set(a0.astype(jnp.int32))
        else:
            anc = anc.at[0].set(0)

        x_res = x_prev[:, anc]
        x_t = propagate(eps_t, x_res, mt_p)
        x_t = x_t.at[0, 0].set(xst[0, 0])
        log_w = logw(x_t, x_res, gt_p)
        wn = jnp.exp(log_w - jnp.max(log_w))
        wn = wn / jnp.sum(wn)
        return (x_t, wn), (x_t[0], log_w[0], anc.astype(jnp.int32))

    row = lambda z: z[:, None, :]
    ua = jnp.broadcast_to(anc_u[:, None, None], (Tm1, 1, N))
    xstar = jnp.broadcast_to(x_star[:, None, None], (Tm1, 1, N))
    rows_in = tuple(m_arr) + tuple(g_arr) + tuple(p_arr)
    (_, _), (xs, log_ws, anc) = jax.lax.scan(
        body, (x0[None], w0[None]),
        (row(eps), row(res_u), ua, xstar, rows_in))
    return xs, log_ws, anc


# --------------------------------------------------------------------------
# Block-lane forward sweep (state-dependent proposals, small d > 1)
# --------------------------------------------------------------------------
#
# Generalisation of the lane sweep to d-dimensional states: particles ride
# a (d, N) block (d on the sublanes, particles on the lanes) and the model's
# `block_propagate(eps, x_prev, mt_p)` / `block_logw(x_next, x_prev, gt_p)`
# callables — (d, N) blocks in, (d, N) / (1, N) out — are traced into the
# kernel. The intended model algebra is a couple of (d, d) @ (d, N)
# dot_generals plus elementwise work (e.g. the SV guided proposal in Q's
# eigenbasis); d is expected small (<= 32 sublanes after padding).
#
# Per-step params arrive as (T-1, L, N) lane-broadcast blocks (L = the
# leaf's per-step length: d for vectors, 1 for scalars). Resampling /
# pinning reuse the scalar sweep's machinery: the ancestor draw is a (1, N)
# computation on the weights, and the particle gather is the dense one-hot
# (d, N) x (N, N) matmul (the chunked gather already takes (m, N) stacks).

def _flatten_params_block(params, Tm1, N):
    leaves, treedef = jax.tree.flatten(params)
    arrays, mask, lens = [], [], []
    for z in leaves:
        if z.size == 0:
            mask.append(False)
            lens.append(0)
            continue
        mask.append(True)
        flat = z.reshape(Tm1, -1)
        lens.append(flat.shape[1])
        arrays.append(jnp.broadcast_to(flat[..., None],
                                       (Tm1, flat.shape[1], N))
                      .astype(jnp.float32))
    return arrays, (treedef, mask, lens)


def _unflatten_params_block(blocks, spec):
    treedef, mask, _ = spec
    it = iter(blocks)
    leaves = [next(it) if m else jnp.zeros(()) for m in mask]
    return jax.tree.unflatten(treedef, leaves)


def _flatten_consts(consts):
    """Model constants (matrices/vectors/scalars) as 2-D f32 kernel inputs —
    Pallas kernels may not capture array constants from closures."""
    leaves, treedef = jax.tree.flatten(consts)
    arrays, shapes = [], []
    for z in leaves:
        z = jnp.asarray(z, jnp.float32)
        shapes.append(z.shape)
        arrays.append(z.reshape((z.shape[0] if z.ndim else 1, -1)))
    return arrays, (treedef, shapes)


def _unflatten_consts(blocks, spec):
    treedef, shapes = spec
    leaves = [b.reshape(s) for b, s in zip(blocks, shapes)]
    return jax.tree.unflatten(treedef, leaves)


def _block_lane_fwd_kernel(*refs, propagate, logw, spec_m, spec_g, spec_cm,
                           spec_cg, n_m, n_g, n_cm, n_cg, d, N):
    (eps_ref, u_ref, xstar_ref, x0_ref, w0_ref) = refs[:5]
    n_par = n_m + n_g
    pr = refs[5:5 + n_par]
    cr = refs[5 + n_par:5 + n_par + n_cm + n_cg]
    logw_ref, anc_ref, xs_ref = refs[5 + n_par + n_cm + n_cg:
                                     8 + n_par + n_cm + n_cg]
    x_scr, w_scr = refs[8 + n_par + n_cm + n_cg:]

    t = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(t == 0)
    def _():
        x_scr[:] = x0_ref[:]
        w_scr[:] = w0_ref[:]

    x_prev = x_scr[:]                   # (d, N)
    w = w_scr[:]                        # (1, N)
    u = u_ref[0]                        # (1, N)
    eps = eps_ref[0]                    # (d, N)
    x_star = xstar_ref[0]               # (d, N) (lane-broadcast)

    mt_p = _unflatten_params_block([r[0] for r in pr[:n_m]], spec_m)
    gt_p = _unflatten_params_block([r[0] for r in pr[n_m:]], spec_g)
    mt_c = _unflatten_consts([r[...] for r in cr[:n_cm]], spec_cm)
    gt_c = _unflatten_consts([r[...] for r in cr[n_cm:]], spec_cg)

    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    lane_blk = jax.lax.broadcasted_iota(jnp.int32, (d, N), 1)

    # Conditional multinomial on the (1, N) weight row (dense inverse-CDF
    # rank count, as in the scalar sweep).
    io0 = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    io1 = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    LT = (io0 <= io1).astype(f32)
    cw = jax.lax.dot_general(w, LT, (((1,), (0,)), ((), ())),
                             preferred_element_type=f32,
                             precision=jax.lax.Precision.HIGHEST)
    cw_col = _col_from_row(cw, N)
    lt_mask = (jnp.broadcast_to(cw_col, (N, N))
               < jnp.broadcast_to(u, (N, N))).astype(f32)
    anc = jax.lax.dot_general(jnp.ones((1, N), f32), lt_mask,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=f32,
                              precision=jax.lax.Precision.HIGHEST)
    anc = jnp.minimum(anc, f32(N - 1))
    anc = jnp.where(lane_row == 0, f32(0.0), anc)

    # Particle gather: one (d, N) x (N, N) one-hot matmul.
    ancb = jnp.broadcast_to(anc, (N, N))
    O = (io0.astype(f32) == ancb).astype(f32)
    x_res = jax.lax.dot_general(x_prev, O, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32,
                                precision=jax.lax.Precision.HIGHEST)

    # Cast at the boundary: under x64 (CPU interpret tests) model closure
    # constants promote the traced values to f64, while the refs are f32.
    x_t = propagate(eps, x_res, mt_p, mt_c)
    x_t = jnp.where(lane_blk == 0, x_star, x_t).astype(f32)
    log_w = logw(x_t, x_res, gt_p, gt_c).astype(f32)      # (1, N)

    logw_ref[0] = log_w
    anc_ref[0] = anc
    xs_ref[0] = x_t

    mW = jnp.max(log_w, axis=1, keepdims=True)
    wn = jnp.exp(log_w - mW)
    w_scr[:] = wn / jnp.sum(wn, axis=1, keepdims=True)
    x_scr[:] = x_t


def block_lane_forward_scan(propagate, logw, mt_params, gt_params, mt_consts,
                            gt_consts, eps, res_u, x_star, x0, w0,
                            interpret=False):
    """cSMC forward sweep with in-kernel (d, N)-block model callables.

    propagate(eps, x_prev, mt_p, mt_c) -> (d, N);
    logw(x_next, x_prev, gt_p, gt_c) -> (1, N); param leaves arrive as
    (L, N) lane-broadcast blocks, model constants (`*_consts` pytrees of
    matrices/vectors) as 2-D f32 blocks (Pallas kernels may not capture
    array constants).
    eps : (T-1, d, N); res_u : (T-1, N); x_star : (T-1, d);
    x0 : (d, N); w0 : (N,).
    Returns (xs (T-1, d, N), log_ws (T-1, N), ancestors (T-1, N) int32).
    Dense resampling only (N <= _DENSE_MAX_N); no PGAS (the guided family
    uses backward sampling).
    """
    Tm1, d, N = eps.shape
    f32 = jnp.float32
    assert N <= _DENSE_MAX_N, N

    seg = max(1, _LANE_SEG_ELEMS // (N * d))
    if Tm1 > seg:
        outs, start = [], 0
        x_c, w_c = x0, w0
        while start < Tm1:
            stop = min(start + seg, Tm1)
            sl = lambda z: z[start:stop]
            o = block_lane_forward_scan(
                propagate, logw, jax.tree.map(sl, mt_params),
                jax.tree.map(sl, gt_params), mt_consts, gt_consts,
                sl(eps), sl(res_u), sl(x_star), x_c, w_c,
                interpret=interpret)
            outs.append(o)
            x_c = o[0][-1]
            lw_last = o[1][-1]
            wn = jnp.exp(lw_last - jnp.max(lw_last))
            w_c = wn / jnp.sum(wn)
            start = stop
        return tuple(jnp.concatenate([o[i] for o in outs], axis=0)
                     for i in range(3))

    m_arr, spec_m = _flatten_params_block(mt_params, Tm1, N)
    g_arr, spec_g = _flatten_params_block(gt_params, Tm1, N)
    cm_arr, spec_cm = _flatten_consts(mt_consts)
    cg_arr, spec_cg = _flatten_consts(gt_consts)

    xstar = jnp.broadcast_to(x_star[..., None], (Tm1, d, N)).astype(f32)

    blk_spec = lambda L: pl.BlockSpec((1, L, N), lambda t: (t, 0, 0),
                                      memory_space=pltpu.VMEM)
    row_spec = blk_spec(1)
    init_blk = pl.BlockSpec((d, N), lambda t: (0, 0), memory_space=pltpu.VMEM)
    init_row = pl.BlockSpec((1, N), lambda t: (0, 0), memory_space=pltpu.VMEM)

    n_m, n_g = len(m_arr), len(g_arr)
    const_spec = lambda z: pl.BlockSpec(z.shape, lambda t: (0, 0),
                                        memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _block_lane_fwd_kernel, propagate=propagate, logw=logw,
        spec_m=spec_m, spec_g=spec_g, spec_cm=spec_cm, spec_cg=spec_cg,
        n_m=n_m, n_g=n_g, n_cm=len(cm_arr), n_cg=len(cg_arr), d=d, N=N)

    outs = pl.pallas_call(
        kernel,
        grid=(Tm1,),
        in_specs=[blk_spec(d), row_spec, blk_spec(d), init_blk, init_row]
                 + [blk_spec(z.shape[1]) for z in m_arr]
                 + [blk_spec(z.shape[1]) for z in g_arr]
                 + [const_spec(z) for z in cm_arr]
                 + [const_spec(z) for z in cg_arr],
        out_specs=(row_spec, row_spec, blk_spec(d)),
        out_shape=(jax.ShapeDtypeStruct((Tm1, 1, N), f32),
                   jax.ShapeDtypeStruct((Tm1, 1, N), f32),
                   jax.ShapeDtypeStruct((Tm1, d, N), f32)),
        scratch_shapes=[pltpu.VMEM((d, N), f32), pltpu.VMEM((1, N), f32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(eps.astype(f32), res_u[:, None, :].astype(f32), xstar,
      x0.astype(f32), w0[None].astype(f32), *m_arr, *g_arr,
      *cm_arr, *cg_arr)
    log_ws, anc, xs_out = outs
    return (xs_out, log_ws[:, 0], anc[:, 0].astype(jnp.int32))


def block_lane_scan_xla(propagate, logw, mt_params, gt_params, mt_consts,
                        gt_consts, eps, res_u, x_star, x0, w0):
    """XLA reference/fallback of `block_lane_forward_scan` (same algebra,
    same (d, N) block calling convention, same f32 const casting)."""
    Tm1, d, N = eps.shape
    m_arr, spec_m = _flatten_params_block(mt_params, Tm1, N)
    g_arr, spec_g = _flatten_params_block(gt_params, Tm1, N)
    cm_arr, spec_cm = _flatten_consts(mt_consts)
    cg_arr, spec_cg = _flatten_consts(gt_consts)
    mt_c = _unflatten_consts(cm_arr, spec_cm)
    gt_c = _unflatten_consts(cg_arr, spec_cg)

    def body(carry, inp):
        x_prev, w = carry
        eps_t, u_t, xst, blocks = inp
        mt_p = _unflatten_params_block(list(blocks[:len(m_arr)]), spec_m)
        gt_p = _unflatten_params_block(list(blocks[len(m_arr):]), spec_g)

        cw = jnp.cumsum(w)
        anc = jnp.clip(jnp.searchsorted(cw, u_t), 0, N - 1).astype(jnp.int32)
        anc = anc.at[0].set(0)

        x_res = x_prev[:, anc]
        x_t = propagate(eps_t, x_res, mt_p, mt_c)
        x_t = jnp.where(jnp.arange(N)[None, :] == 0, xst,
                        x_t).astype(jnp.float32)
        log_w = logw(x_t, x_res, gt_p, gt_c)[0].astype(jnp.float32)
        wn = jnp.exp(log_w - jnp.max(log_w))
        wn = wn / jnp.sum(wn)
        return (x_t, wn), (x_t, log_w, anc)

    f32 = jnp.float32
    xstar = jnp.broadcast_to(x_star[..., None], (Tm1, d, N)).astype(f32)
    blocks_in = tuple(m_arr) + tuple(g_arr)
    (_, _), (xs, log_ws, anc) = jax.lax.scan(
        body, (x0.astype(f32), (w0 / jnp.sum(w0)).astype(f32)),
        (eps.astype(f32), res_u.astype(f32), xstar, blocks_in))
    return xs, log_ws, anc
