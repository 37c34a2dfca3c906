"""Fused N^2 stitching for parallel-in-time cSMC (dSMC tree nodes).

Capability: the stitching step of reference
`_primitives/csmc/pit/operator.py:133-149` builds an (N, N) matrix of
boundary weights w_ij = Gt(x_right_j, x_left_i) + log_w_i + log_w_j with a
nested vmap over a user callable, materialising P x N^2 floats per tree
level (32 GB at the BASELINE T=1024, N=4096 config). This module is the
TPU-native redesign for *factorisable* potentials.

Factorised form
---------------
When the boundary potential decomposes over all pairs as

    Gt(x_j, x_i) = row_bias[i] + col_bias[j] + row_feat[i] . col_feat[j]

(exactly the case for Gaussian transition densities — the quadratic
cross-term is a rank-d matmul — with any previous-state-independent
observation potential absorbed into col_bias), the stitching draw becomes:

  stage 0  row_lse[i] = logsumexp_j(row_feat[i] . col_feat[j] + col_bias[j])
           -> Pallas kernel: one MXU matmul per 128-row block, S kept in
           VMEM, O(N k) HBM traffic instead of O(N^2).
  stage 1  rows ~ Cat(softmax(row_bias + row_lse)), N iid draws by inverse
           CDF from hoisted uniforms (XLA; N values per node — tiny).
  stage 2  col_k ~ Cat(softmax(row_feat[rows_k] . col_feat + col_bias))
           -> Pallas kernel: recompute the sampled rows' scores blockwise
           and draw by Gumbel-argmax with the in-kernel PRNG (exact
           categorical; one pass, no prefix sums).

The two-stage draw factorises the flat N^2 categorical exactly:
P(i, j) = P(i) P(j | i). Pair 0 is pinned to (0, 0) by the caller for the
conditional (reference-preserving) version.

All kernels carry a leading `pairs` grid axis so one launch serves every
node of a tree level (dc_map's vmap contract) without vmap-of-pallas_call.
"""
import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_BLOCK = 128
# Above this N the (ROW_BLOCK, N) score block exceeds the VMEM budget;
# callers should fall back to the XLA blocked path.
MAX_FUSED_N = 16384
# The single-pass block-mass kernel holds two (ROW_BLOCK, N) f32 buffers
# (scores + exponentials) plus the (N, nb) indicator in VMEM.
MAX_BLOCKED_N = 8192
_COL_BLOCK = 128


def _pair_scores(rf, cfT, cb, n_rows, N, k):
    """Scores s[i, j] = rf_i . cf_j + cb_j as k broadcast outer products.

    The contraction depth k is tiny (state dim + 1-ish), so an MXU
    dot_general would run at ~k/128 utilisation; k explicit
    (rows, 1) x (1, N) broadcast products keep the whole thing on the VPU.
    `cfT` is the (k, N) transposed column-feature block (transposed on the
    host — free — because Mosaic cannot transpose the lane dim in-kernel).
    """
    s = jnp.broadcast_to(cb, (n_rows, N))
    for kk in range(k):
        r_col = jnp.broadcast_to(_kslice(rf, kk, axis=1), (n_rows, N))
        c_row = jnp.broadcast_to(_kslice(cfT, kk, axis=0), (n_rows, N))
        s = s + r_col * c_row
    return s


def _kslice(z, i, axis):
    return jax.lax.slice_in_dim(z, i, i + 1, axis=axis)


def _row_lse_kernel(rf_ref, cfT_ref, cb_ref, out_ref, *, k):
    """lse[i] = logsumexp_j(rf_i . cf_j + cb_j) for one 128-row block."""
    rf = rf_ref[0]          # (ROW_BLOCK, k)
    cfT = cfT_ref[0]        # (k, N)
    cb = cb_ref[0]          # (1, N)
    s = _pair_scores(rf, cfT, cb, _ROW_BLOCK, cfT.shape[1], k)
    m = jnp.max(s, axis=1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(s - m), axis=1, keepdims=True))
    out_ref[0, 0] = lse[:, 0].reshape(1, _ROW_BLOCK)


def row_lse(row_feat, col_feat, col_bias, *, interpret=False):
    """Batched row-logsumexp of the factorised pairwise scores.

    row_feat (P, N, k); col_feat (P, N, k); col_bias (P, N) -> (P, N).
    """
    P, N, k = row_feat.shape
    rb_blocks = pl.cdiv(N, _ROW_BLOCK)
    # Output laid out (P, rb, 1, ROW_BLOCK): Mosaic requires the last two
    # block dims to be (divisible by 8, divisible by 128) or equal to the
    # array dims — (1, ROW_BLOCK) blocks on a (P, N) array are rejected.
    out = pl.pallas_call(
        functools.partial(_row_lse_kernel, k=k),
        grid=(P, rb_blocks),
        in_specs=[
            pl.BlockSpec((1, _ROW_BLOCK, k), lambda p, r: (p, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, N), lambda p, r: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda p, r: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, _ROW_BLOCK), lambda p, r: (p, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, rb_blocks, 1, _ROW_BLOCK), jnp.float32),
        interpret=interpret,
    )(row_feat, jnp.swapaxes(col_feat, 1, 2), col_bias[:, None, :])
    return out.reshape(P, rb_blocks * _ROW_BLOCK)[:, :N]


def _mix32(h):
    """murmur3 finalizer round (uint32)."""
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> jnp.uint32(16))
    return h


def counter_uniform(seed, pair, block, rows, cols):
    """Counter-based uniform in (0, 1): a double murmur3-finalizer hash of
    (seed, pair, block, row, col). Plain integer ops only, so the law is
    bit-identical on Mosaic hardware, in interpret mode, and in the XLA
    fallback — unlike `pltpu.prng_random_bits`, which the TPU interpreter
    stubs out. Quality is ample for Gumbel-argmax draws (distinct counters,
    two full avalanche rounds)."""
    seed = seed.astype(jnp.uint32)
    h = seed * jnp.uint32(0x9E3779B1)
    h = h ^ (pair.astype(jnp.uint32) * jnp.uint32(0x85EBCA77))
    h = h ^ (block.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D))
    h = _mix32(h ^ (rows.astype(jnp.uint32) * jnp.uint32(0x27D4EB2F)
                    + cols.astype(jnp.uint32) * jnp.uint32(0x165667B1)))
    h = _mix32(h + jnp.uint32(0x9E3779B9))
    # Mosaic can't cast uint32 -> f32 directly; the top-24-bit value fits in
    # int32, so the int32 detour is exact and bit-identical everywhere.
    h24 = (h >> jnp.uint32(8)).astype(jnp.int32)
    return h24.astype(jnp.float32) * (1.0 / (1 << 24)) + jnp.float32(2 ** -25)


def _gumbel_argmax_scores(s, seed, pair, block):
    rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    u = counter_uniform(seed, pair, block, rows, cols)
    score = s - jnp.log(-jnp.log(u))
    m = jnp.max(score, axis=1, keepdims=True)
    n_cols = score.shape[1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
    return jnp.min(jnp.where(score >= m, col_ids, n_cols), axis=1, keepdims=True)


def _col_sample_kernel(seed_ref, rf_ref, cfT_ref, cb_ref, out_ref, *, k):
    """Gumbel-argmax categorical over columns for one 128-row block of
    sampled rows; counters keyed by (pair, block) keep draws independent.
    `seed_ref` holds (seed, pair_offset): the offset shifts the pair counter
    so a sharded launch over a slice of a level's nodes draws bit-identically
    to the full single-device launch."""
    p = pl.program_id(0) + seed_ref[1]
    r = pl.program_id(1)

    rf = rf_ref[0]          # (ROW_BLOCK, k)
    cfT = cfT_ref[0]        # (k, N)
    cb = cb_ref[0]          # (1, N)
    s = _pair_scores(rf, cfT, cb, _ROW_BLOCK, cfT.shape[1], k)

    idx = _gumbel_argmax_scores(s, seed_ref[0], p, r)
    out_ref[0, 0] = idx[:, 0].reshape(1, -1)


def col_sample(seed, row_feat_sel, col_feat, col_bias, *, pair_offset=0,
               interpret=False):
    """Draw one column per sampled row from the exact conditional categorical.

    seed (int32 scalar array); row_feat_sel (P, n, k); col_feat (P, N, k);
    col_bias (P, N) -> (P, n) int32 column indices. `pair_offset` shifts the
    pair counter (see `_col_sample_kernel`).
    """
    P, n, k = row_feat_sel.shape
    N = col_feat.shape[1]
    rb_blocks = pl.cdiv(n, _ROW_BLOCK)
    out = pl.pallas_call(
        functools.partial(_col_sample_kernel, k=k),
        grid=(P, rb_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _ROW_BLOCK, k), lambda p, r: (p, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, N), lambda p, r: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda p, r: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, _ROW_BLOCK), lambda p, r: (p, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, rb_blocks, 1, _ROW_BLOCK), jnp.int32),
        interpret=interpret,
    )(jnp.stack([jnp.asarray(seed, jnp.int32).reshape(()),
                 jnp.asarray(pair_offset, jnp.int32).reshape(())]),
      row_feat_sel, jnp.swapaxes(col_feat, 1, 2), col_bias[:, None, :])
    return out.reshape(P, rb_blocks * _ROW_BLOCK)[:, :n]


# --------------------------------------------------------------------------
# Single-pass blocked path (large N): one score pass emits per-row
# column-block log-masses; the column draw then needs only an nb-way block
# draw plus one 128-wide within-block pass — no second N^2 sweep and no
# per-element hash/Gumbel over the full row.
# --------------------------------------------------------------------------

def _block_indicator(N, nb, dtype):
    j = jax.lax.broadcasted_iota(jnp.int32, (N, nb), 0)
    b = jax.lax.broadcasted_iota(jnp.int32, (N, nb), 1)
    return ((j >> 7) == b).astype(dtype)      # _COL_BLOCK == 128


def _block_masses_kernel(rf_ref, cfT_ref, cb_ref, out_ref, *, k, nb):
    """Lb[i, b] = log sum_{j in col-block b} exp(rf_i . cf_j + cb_j) for one
    128-row block. The block reduction is an MXU matmul of the exponentials
    with a static (N, nb) indicator."""
    rf = rf_ref[0]          # (ROW_BLOCK, k)
    cfT = cfT_ref[0]        # (k, N)
    cb = cb_ref[0]          # (1, N)
    N = cfT.shape[1]
    s = _pair_scores(rf, cfT, cb, _ROW_BLOCK, N, k)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    B = _block_indicator(N, nb, s.dtype)
    mass = jax.lax.dot_general(e, B, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    out_ref[0, 0] = jnp.log(mass) + m


def block_masses(row_feat, col_feat, col_bias, *, interpret=False):
    """Per-row column-block log-masses of the factorised pairwise scores.

    row_feat (P, N, k); col_feat (P, N, k); col_bias (P, N) -> (P, N, nb)
    with nb = N // 128 (N must be a multiple of 128). The full row-LSE is
    `logsumexp(out, axis=-1)`.
    """
    P, N, k = row_feat.shape
    assert N % _COL_BLOCK == 0, N
    nb = N // _COL_BLOCK
    rb_blocks = pl.cdiv(N, _ROW_BLOCK)
    out = pl.pallas_call(
        functools.partial(_block_masses_kernel, k=k, nb=nb),
        grid=(P, rb_blocks),
        in_specs=[
            pl.BlockSpec((1, _ROW_BLOCK, k), lambda p, r: (p, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, N), lambda p, r: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda p, r: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, _ROW_BLOCK, nb),
                               lambda p, r: (p, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, rb_blocks, _ROW_BLOCK, nb),
                                       jnp.float32),
        interpret=interpret,
    )(row_feat, jnp.swapaxes(col_feat, 1, 2), col_bias[:, None, :])
    return out.reshape(P, rb_blocks * _ROW_BLOCK, nb)[:, :N]


def block_masses_xla(row_feat, col_feat, col_bias):
    """Blocked XLA equivalent of `block_masses` (same indicator matmul)."""
    P, N, k = row_feat.shape
    assert N % _COL_BLOCK == 0, N
    nb = N // _COL_BLOCK
    rbs = -(-N // _ROW_BLOCK)
    rf = row_feat.reshape(P, rbs, _ROW_BLOCK, k).transpose(1, 0, 2, 3)
    B = _block_indicator(N, nb, row_feat.dtype)

    def one(rf_blk):
        s = jnp.einsum("pik,pjk->pij", rf_blk, col_feat) + col_bias[:, None, :]
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        mass = jax.lax.dot_general(e, B, (((2,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        return jnp.log(mass) + m                 # (P, ROW_BLOCK, nb)

    out = jax.lax.map(one, rf)                   # (rbs, P, ROW_BLOCK, nb)
    return out.transpose(1, 0, 2, 3).reshape(P, rbs * _ROW_BLOCK, nb)[:, :N]


def blocked_col_sample(seed, rows, Lb, row_feat_sel, col_feat, col_bias,
                       pair_offset=0):
    """Column draws from the exact conditional categorical using block masses.

    Exact two-stage factorisation P(j | i) = P(block | i) P(j | i, block):
    the block is drawn by inverse CDF over the nb log-masses, the
    within-block column by Gumbel-argmax over one recomputed 128-wide score
    slice. All XLA — the per-draw work is O(nb + 128), not O(N).

    seed: int32 scalar; rows (P, n) sampled row ids; Lb (P, N, nb) from
    `block_masses`; row_feat_sel (P, n, k); col_feat (P, N, k);
    col_bias (P, N) -> (P, n) int32.
    """
    P, n, k = row_feat_sel.shape
    N = col_feat.shape[1]
    nb = N // _COL_BLOCK
    seed = jnp.asarray(seed, jnp.int32)
    pair_ids = (jnp.arange(P, dtype=jnp.int32)
                + jnp.asarray(pair_offset, jnp.int32))[:, None]   # (P, 1)
    draw_ids = jnp.arange(n, dtype=jnp.int32)[None, :]            # (1, n)

    # Stage 2a: block ~ Cat(exp(Lb[row])). Separate counter stream from the
    # within-block stage via a mixed seed.
    seed_blk = _mix32(seed.astype(jnp.uint32) ^ jnp.uint32(0x5BD1E995))
    u_blk = counter_uniform(seed_blk, pair_ids, jnp.int32(nb), draw_ids,
                            jnp.zeros_like(draw_ids))             # (P, n)
    Lb_sel = jnp.take_along_axis(Lb, rows[:, :, None], axis=1)    # (P, n, nb)
    m = jnp.max(Lb_sel, axis=-1, keepdims=True)
    w = jnp.exp(Lb_sel - m)
    cdf = jnp.cumsum(w, axis=-1)
    target = (u_blk * cdf[..., -1])[..., None]
    blocks = jnp.sum((cdf < target).astype(jnp.int32), axis=-1)
    blocks = jnp.clip(blocks, 0, nb - 1).astype(jnp.int32)        # (P, n)

    # Stage 2b: recompute the chosen 128-wide block's scores per draw.
    cf_blk = col_feat.reshape(P, nb, _COL_BLOCK, k)
    cf_sel = jnp.take_along_axis(
        cf_blk, blocks[:, :, None, None], axis=1)                 # (P, n, 128, k)
    cb_blk = col_bias.reshape(P, nb, _COL_BLOCK)
    cb_sel = jnp.take_along_axis(cb_blk, blocks[:, :, None], axis=1)
    s2 = jnp.einsum("pnk,pnjk->pnj", row_feat_sel, cf_sel) + cb_sel
    j_loc = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 2)
    u_in = counter_uniform(seed, pair_ids[..., None], draw_ids[..., None],
                           blocks[:, :, None], j_loc)             # (P, n, 128)
    g = s2 - jnp.log(-jnp.log(u_in))
    j_star = jnp.argmax(g, axis=-1).astype(jnp.int32)
    return blocks * _COL_BLOCK + j_star


# --------------------------------------------------------------------------
# XLA fallbacks (CPU tests / N beyond the VMEM budget)
# --------------------------------------------------------------------------

def row_lse_xla(row_feat, col_feat, col_bias, block=512):
    """Blocked XLA equivalent of `row_lse` (never materialises P x N^2)."""
    P, N, k = row_feat.shape
    nb = -(-N // block)
    pad = nb * block - N
    rf = jnp.pad(row_feat, ((0, 0), (0, pad), (0, 0)))
    rf = rf.reshape(P, nb, block, k).transpose(1, 0, 2, 3)

    def one(rf_blk):
        s = jnp.einsum("pik,pjk->pij", rf_blk, col_feat) + col_bias[:, None, :]
        m = jnp.max(s, axis=-1, keepdims=True)
        return (m + jnp.log(jnp.sum(jnp.exp(s - m), axis=-1, keepdims=True)))[..., 0]

    out = jax.lax.map(one, rf)                       # (nb, P, block)
    return out.transpose(1, 0, 2).reshape(P, nb * block)[:, :N]


def col_sample_xla(seed, row_feat_sel, col_feat, col_bias, pair_offset=0):
    """Blocked XLA equivalent of `col_sample` — same counter-based Gumbel
    draws, so results are bit-identical to the Pallas kernel."""
    P, n, k = row_feat_sel.shape
    nb = -(-n // _ROW_BLOCK)
    pad = nb * _ROW_BLOCK - n
    rf = jnp.pad(row_feat_sel, ((0, 0), (0, pad), (0, 0)))
    rf = rf.reshape(P, nb, _ROW_BLOCK, k)
    pair_ids = jnp.arange(P, dtype=jnp.int32) + jnp.asarray(pair_offset, jnp.int32)
    block_ids = jnp.arange(nb, dtype=jnp.int32)

    def one_block(r, rf_blk):
        # rf_blk: (P, ROW_BLOCK, k)
        s = jnp.einsum("pik,pjk->pij", rf_blk, col_feat) + col_bias[:, None, :]
        idx = jax.vmap(
            lambda s_p, p: _gumbel_argmax_scores(s_p, seed, p, r)
        )(s, pair_ids)
        return idx[..., 0]                           # (P, ROW_BLOCK)

    out = jax.lax.map(lambda args: one_block(args[0], args[1]),
                      (block_ids, rf.transpose(1, 0, 2, 3)))
    return out.transpose(1, 0, 2).reshape(P, nb * _ROW_BLOCK)[:, :n].astype(jnp.int32)
