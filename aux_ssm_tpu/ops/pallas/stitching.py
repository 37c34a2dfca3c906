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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..take import (categorical_from_uniforms, take_rows, _use_tile_path,
                    _three_level_draw, _select_tile_rows, _prefix_tile, _TILE)

_ROW_BLOCK = 128
# Finite stand-in for -inf log-masses: far below any real score, yet
# 0 * _NEG_FLOOR = 0 (not NaN) in the one-hot selection matmuls, and
# exp(_NEG_FLOOR - m) underflows to exactly 0 for any finite m.
_NEG_FLOOR = -1e30
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
    # Mosaic can't cast uint32 -> f32 directly; the top-23-bit value fits in
    # int32, so the int32 detour is exact and bit-identical everywhere.
    # 23 bits (not 24): every lattice value h23 * 2^-23 + 2^-24 is exactly
    # representable in f32, so the result lies in [2^-24, 1 - 2^-24] with NO
    # rounding. A 24-bit lattice's top value 1 - 2^-25 rounds (ties-to-even)
    # to exactly 1.0, and -log(-log(1.0)) = +inf then makes that element win
    # any Gumbel-argmax draw unconditionally — a silent once-in-2^24 wrong
    # sample (observed: a -inf-weight column drawn through `blocked_col_sample`).
    h23 = (h >> jnp.uint32(9)).astype(jnp.int32)
    return h23.astype(jnp.float32) * (1.0 / (1 << 23)) + jnp.float32(2 ** -24)


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


def _env_per_block_max():
    """`AUX_SSM_BLOCK_MAX=block` forces the per-block stabiliser on the
    unsharded paths (used by the particle-sharded bit-identity tests);
    default 'row' keeps the cheaper row max on one chip."""
    return os.environ.get("AUX_SSM_BLOCK_MAX", "row") == "block"


def _block_masses_kernel(rf_ref, cfT_ref, cb_ref, out_ref, *, k, nb,
                         per_block_max):
    """Lb[i, b] = log sum_{j in col-block b} exp(rf_i . cf_j + cb_j) for one
    128-row block. The block reduction is nb static 128-lane slice sums
    (`jnp.sum` cross-lane reduce per column block) — measured 1.7x device
    time over the previous MXU formulation (3-plane bf16 indicator matmul)
    at N=4096 P=512: the matmul ran at nb/128 output-lane utilisation, the
    VPU reduce has no such waste (same-session A/B, RESULTS_r5.md). The
    summation association differs from a linear matmul accumulation by
    ~1e-5 on the log-masses (tree vs linear sum over 128 nonnegative
    terms); the XLA twin `block_masses_xla` stays matmul-based, so the
    kernel/twin comparison bands are 5e-5.

    Stabiliser: the row max by default (cheapest — one reduction). With
    `per_block_max`, the PER-BLOCK max instead: each block's mass then
    depends only on that block's columns bit-for-bit, which is what makes
    the column-sharded stitching identical across shard counts."""
    rf = rf_ref[0]          # (ROW_BLOCK, k)
    cfT = cfT_ref[0]        # (k, N)
    cb = cb_ref[0]          # (1, N)
    N = cfT.shape[1]
    s = _pair_scores(rf, cfT, cb, _ROW_BLOCK, N, k)
    if per_block_max:
        m_row = None
    else:
        m_row = jnp.max(s, axis=1, keepdims=True)
        m_row = jnp.where(jnp.isfinite(m_row), m_row, 0.0)
    cols = []
    for b in range(nb):
        s_b = jax.lax.slice_in_dim(s, b * _COL_BLOCK, (b + 1) * _COL_BLOCK,
                                   axis=1)
        if per_block_max:
            # An all--inf block would give exp(-inf - -inf) = nan; the zero
            # floor keeps the exact -inf mass.
            m_b = jnp.max(s_b, axis=1, keepdims=True)
            m_b = jnp.where(jnp.isfinite(m_b), m_b, 0.0)
        else:
            m_b = m_row
        mass_b = jnp.sum(jnp.exp(s_b - m_b), axis=1, keepdims=True)
        cols.append(jnp.log(mass_b) + m_b)
    out_ref[0, 0] = cols[0] if nb == 1 else jnp.concatenate(cols, axis=1)


def block_masses(row_feat, col_feat, col_bias, *, per_block_max=None,
                 interpret=False):
    """Per-row column-block log-masses of the factorised pairwise scores.

    row_feat (P, Nr, k); col_feat (P, Nc, k); col_bias (P, Nc) ->
    (P, Nr, nb) with nb = Nc // 128 (Nc must be a multiple of 128; Nc may
    differ from Nr — the particle-sharded stitching scores the full row set
    against a local column slice). The full row-LSE is
    `logsumexp(out, axis=-1)`.
    """
    P, Nr, k = row_feat.shape
    Nc = col_feat.shape[1]
    assert Nc % _COL_BLOCK == 0, Nc
    if per_block_max is None:
        per_block_max = _env_per_block_max()
    nb = Nc // _COL_BLOCK
    rb_blocks = pl.cdiv(Nr, _ROW_BLOCK)
    out = pl.pallas_call(
        functools.partial(_block_masses_kernel, k=k, nb=nb,
                          per_block_max=per_block_max),
        grid=(P, rb_blocks),
        in_specs=[
            pl.BlockSpec((1, _ROW_BLOCK, k), lambda p, r: (p, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, Nc), lambda p, r: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Nc), lambda p, r: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, _ROW_BLOCK, nb),
                               lambda p, r: (p, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, rb_blocks, _ROW_BLOCK, nb),
                                       jnp.float32),
        interpret=interpret,
    )(row_feat, jnp.swapaxes(col_feat, 1, 2), col_bias[:, None, :])
    return out.reshape(P, rb_blocks * _ROW_BLOCK, nb)[:, :Nr]


def block_masses_xla(row_feat, col_feat, col_bias, per_block_max=None):
    """Blocked XLA equivalent of `block_masses` (same stabiliser choice:
    row max by default, per-block max for the column-sharded stitching)."""
    P, Nr, k = row_feat.shape
    Nc = col_feat.shape[1]
    assert Nc % _COL_BLOCK == 0, Nc
    if per_block_max is None:
        per_block_max = _env_per_block_max()
    nb = Nc // _COL_BLOCK
    rbs = -(-Nr // _ROW_BLOCK)
    pad_r = rbs * _ROW_BLOCK - Nr
    if pad_r:
        row_feat = jnp.pad(row_feat, ((0, 0), (0, pad_r), (0, 0)))
    rf = row_feat.reshape(P, rbs, _ROW_BLOCK, k).transpose(1, 0, 2, 3)
    B = _block_indicator(Nc, nb, row_feat.dtype)

    def one(rf_blk):
        s = jnp.einsum("pik,pjk->pij", rf_blk, col_feat) + col_bias[:, None, :]
        if per_block_max:
            # Each block's mass depends only on that block's columns — the
            # invariant the column-sharded stitching relies on.
            s4 = s.reshape(P, _ROW_BLOCK, nb, _COL_BLOCK)
            m = jnp.max(s4, axis=-1, keepdims=True)
            m = jnp.where(jnp.isfinite(m), m, 0.0)  # all--inf block -> -inf
            mass = jnp.sum(jnp.exp(s4 - m), axis=-1)
            return jnp.log(mass) + m[..., 0]     # (P, ROW_BLOCK, nb)
        m = jnp.max(s, axis=-1, keepdims=True)
        m = jnp.where(jnp.isfinite(m), m, 0.0)
        e = jnp.exp(s - m)
        mass = jax.lax.dot_general(e, B, (((2,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        return jnp.log(mass) + m                 # (P, ROW_BLOCK, nb)

    out = jax.lax.map(one, rf)                   # (rbs, P, ROW_BLOCK, nb)
    return out.transpose(1, 0, 2, 3).reshape(P, rbs * _ROW_BLOCK, nb)[:, :Nr]


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
    Lb = jnp.maximum(Lb, _NEG_FLOOR)   # -inf (empty block) -> finite floor
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

    return within_block_cols(seed, blocks, row_feat_sel, col_feat, col_bias,
                             pair_offset=pair_offset)


def _stage2_mode():
    """Uniform-to-index mapping of the within-group column draw.

    'gumbel' (default): per-lane Gumbel-argmax — one counter hash + two
    logs per recomputed score lane. 'icdf': ONE uniform per draw + inverse
    CDF over the G lanes — same exact conditional categorical law, G-fold
    fewer transcendentals on paper, but measured SLOWER on v5e at the
    N=4096 bench shape (5.7 vs 6.13 samples/s full-step with a cumsum CDF,
    5.02 with a `_prefix_tile` matmul CDF, same session, RESULTS_r5.md):
    the Gumbel score/argmax fuses into the s2 pass while the icdf variant
    adds materialised (P, n, G) exp/cumsum passes that are HBM-bound, and
    the transcendental saving never shows. Kept opt-in for architectures
    where the balance differs."""
    return os.environ.get("AUX_SSM_STAGE2", "gumbel")


def within_block_cols(seed, blocks, row_feat_sel, col_feat, col_bias,
                      pair_offset=0, col_extra=None, group=_COL_BLOCK):
    """Stage 2b alone: given each draw's column group, draw the within-group
    column by Gumbel-argmax over the recomputed `group`-wide score slice.
    Counter stream (seed, pair, draw, group_id, j_loc) — identical to the
    corresponding stage of `blocked_col_sample`/`stitch_draws` at the
    default group width 128.

    blocks (P, n) int32 group ids; row_feat_sel (P, n, k); col_feat
    (P, N, k); col_bias (P, N) -> (P, n) int32 column ids. `group` is the
    column-group width (a multiple of 128): the super-block stage-1 draws
    over (row, 512-column super) and resolves the column here in one
    512-wide pass — see `kernels/pit._fused_node_draw`. `col_extra`
    (P, N, e) appends per-column values to the group-payload ride; returns
    (cols, extra_sel (P, n, e)) with extra_sel[p, i] = col_extra[p, cols[p, i]]
    resolved by a within-group lane reduce (exact) — no separate
    `take_rows(extra, cols)` pass.
    """
    P, n, k = row_feat_sel.shape
    N = col_feat.shape[1]
    G = group
    ng = N // G
    e = 0 if col_extra is None else col_extra.shape[-1]
    seed = jnp.asarray(seed, jnp.int32)
    # -inf biases (indicator potentials / zero weights) would NaN-poison the
    # one-hot payload matmul below (0 * -inf); the floor keeps the law exact
    # (exp underflows to 0) — same clamp as `stitch_draws`.
    col_bias = jnp.maximum(col_bias, _NEG_FLOOR)
    pair_ids = (jnp.arange(P, dtype=jnp.int32)
                + jnp.asarray(pair_offset, jnp.int32))[:, None]   # (P, 1)
    draw_ids = jnp.arange(n, dtype=jnp.int32)[None, :]            # (1, n)

    # The per-draw group payload [cf | cb | extra] is selected with one
    # one-hot MXU matmul (exact at HIGHEST; measured 1.8x over the block
    # gathers).
    parts = [jnp.swapaxes(col_feat.reshape(P, ng, G, k), 2, 3
                          ).reshape(P, ng, k * G),
             col_bias.reshape(P, ng, G)]
    if e:
        parts.append(jnp.swapaxes(col_extra.reshape(P, ng, G, e),
                                  2, 3).reshape(P, ng, e * G))
    payload = jnp.concatenate(parts, axis=-1)
    sel = _select_tile_rows(payload, blocks)          # (P, n, (k+1+e)*G)
    cf_sel = jnp.swapaxes(sel[..., :k * G].reshape(P, n, k, G), 2, 3)
    cb_sel = sel[..., k * G:(k + 1) * G]
    s2 = jnp.einsum("pnk,pnjk->pnj", row_feat_sel, cf_sel) + cb_sel
    j_loc = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 2)
    if _stage2_mode() == "icdf":
        # Counter j = G sits outside the Gumbel stream's j_loc range, so the
        # two modes never share a uniform.
        u1 = counter_uniform(seed, pair_ids[..., None], draw_ids[..., None],
                             blocks[:, :, None],
                             jnp.full_like(blocks[:, :, None], G))  # (P, n, 1)
        m2 = jnp.max(s2, axis=-1, keepdims=True)
        w2 = jnp.exp(s2 - m2)
        # log-shift cumsum, NOT the `_prefix_tile` matmul: at (P, n, G) =
        # (512, 4096, 128) the one-hot-free prefix matmul is 549 GFLOP of
        # HIGHEST-precision work and measured SLOWER than the Gumbel path
        # it replaces (5.7 vs 6.13 samples/s); the shift-add lowering is
        # ~2 G-ops.
        cdf = jnp.cumsum(w2, axis=-1)
        tgt = u1 * cdf[..., -1:]
        j_star = jnp.clip(jnp.sum((cdf < tgt).astype(jnp.int32), axis=-1),
                          0, G - 1)
    else:
        u_in = counter_uniform(seed, pair_ids[..., None], draw_ids[..., None],
                               blocks[:, :, None], j_loc)         # (P, n, G)
        g = s2 - jnp.log(-jnp.log(u_in))
        j_star = jnp.argmax(g, axis=-1).astype(jnp.int32)
    cols = blocks * G + j_star
    if not e:
        return cols
    ex = jnp.swapaxes(sel[..., (k + 1) * G:]
                      .reshape(P, n, e, G), 2, 3)             # (P, n, G, e)
    mask = (j_loc == j_star[..., None])[..., None]
    extra_sel = jnp.sum(jnp.where(mask, ex, jnp.zeros_like(ex)), axis=2)
    return cols, extra_sel


def joint_rowblock_draws(u, row_bias, Lb, row_feat=None, row_extra=None):
    """Joint (row, column-block) draws from P(i, b) ∝ exp(row_bias_i + Lb_ib).

    Because P(i, b) = P(i) P(b | i) with P(i) ∝ exp(row_bias_i + lse_i), one
    flat inverse-CDF draw over the (N * nb) categorical replaces the separate
    row draw *and* the per-draw Lb-row gather of `blocked_col_sample`'s stage
    2a — the heaviest part of the stitching draw at large N. Pure XLA; the
    flat draw runs through the hierarchical tile-CDF path.

    With `row_feat` (P, N, k) given, each draw's row features are returned
    too, selected inside the flat draw's final one-hot tile matmul: a flat
    tile of 128 (row, block) cells spans 128/nb consecutive rows, so the
    whole rf table reshapes to a per-tile payload and the per-draw row gather
    (the slowest stage of the unfused path, ~37 ms at N=4096) disappears.
    `row_extra` (P, N, e) appends more per-row values (e.g. the stitch tree's
    boundary particle values) to the same ride — a separate
    `take_rows(extra, rows)` costs ~15 ms of device time at (512, 4096)
    scalar shapes (benchmarks/take_ab.py) vs ~0 here.

    u (P, n) uniforms; row_bias (P, N); Lb (P, N, nb) -> (rows, blocks)
    [, rf_sel (P, n, k)] [, extra_sel (P, n, e)], each (P, n) int32.
    """
    P, N, nb = Lb.shape
    # Floor -inf cells (empty blocks / zero-weight rows): exactly-zero mass
    # either way, but a finite floor keeps the tile-path max/exp algebra and
    # the rf payload matmul NaN-free.
    flat = (Lb + row_bias[:, :, None]).reshape(P, N * nb)
    flat = jnp.maximum(flat, _NEG_FLOOR)
    NF = N * nb
    if row_feat is None:
        assert row_extra is None
        idx = categorical_from_uniforms(flat, u)
        rows = (idx // nb).astype(jnp.int32)
        return rows, (idx - rows * nb).astype(jnp.int32)

    k = row_feat.shape[-1]
    e = 0 if row_extra is None else row_extra.shape[-1]
    feat = (row_feat if row_extra is None
            else jnp.concatenate([row_feat, row_extra], axis=-1))
    if (_use_tile_path() and NF % _TILE == 0 and NF // _TILE > _TILE
            and _TILE % nb == 0):
        rpt = _TILE // nb                       # rows per flat tile
        payload = feat.reshape(P, NF // _TILE, rpt * (k + e))
        m = jnp.max(flat, axis=-1, keepdims=True)
        w = jnp.exp(flat - m)
        wt = w.reshape(P, NF // _TILE, _TILE)
        idx, psel = _three_level_draw(wt, jnp.sum(wt, axis=-1), u, payload)
        r_loc = (idx % _TILE) // nb             # (P, n) row within the tile
        psel = psel.reshape(P, idx.shape[-1], rpt, k + e)
        lane = jax.lax.broadcasted_iota(jnp.int32, psel.shape[:-1], 2)
        sel = jnp.sum(jnp.where((lane == r_loc[:, :, None])[..., None],
                                psel, 0.0), axis=2)
    else:
        idx = categorical_from_uniforms(flat, u)
        sel = take_rows(feat, (idx // nb).astype(jnp.int32))
    rows = (idx // nb).astype(jnp.int32)
    blocks = (idx - rows * nb).astype(jnp.int32)
    if row_extra is None:
        return rows, blocks, sel
    return rows, blocks, sel[..., :k], sel[..., k:]


# --------------------------------------------------------------------------
# Fully-fused stage-1 + stage-2 draws (large N): row draws, block draws and
# within-block column draws in ONE launch. XLA's gather lowering makes the
# unfused composition (categorical_from_uniforms + take_rows +
# blocked_col_sample) HBM-gather-bound (~180 ms per 512-node level at
# N = 4096 on a v5e, vs 37 ms for the N^2 block-mass pass itself); here every
# gather becomes an on-the-fly one-hot MXU matmul over VMEM-resident
# payloads, so per-draw data never round-trips HBM.
# --------------------------------------------------------------------------


def _lane_cumsum(x, n, roll):
    """Hillis-Steele inclusive cumsum over the last (lane) axis. `roll(z, s)`
    rotates +s along that axis; wrapped lanes are masked off. The shift-add
    association is shared by the kernel (pltpu.roll) and the XLA twin
    (jnp.roll), keeping both paths' f32 CDFs structurally identical."""
    ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    sh = 1
    while sh < n:
        x = x + jnp.where(ids >= sh, roll(x, sh), jnp.zeros_like(x))
        sh *= 2
    return x


def _stage1_rows(rl_flat, rl2, u_t, nb, roll):
    """Hierarchical inverse-CDF row draws for one 128-draw block.

    rl_flat (1, N) row logits; rl2 (nb, 128) the same logits tile-reshaped;
    u_t (128, 1) uniforms -> (128, 1) int32 rows. Same law as
    `take.categorical_from_uniforms` (tile CDF, then within-tile offset)."""
    N = rl_flat.shape[1]
    m = jnp.max(rl_flat, axis=1, keepdims=True)            # (1, 1)
    w_flat = jnp.exp(rl_flat - jnp.broadcast_to(m, rl_flat.shape))
    B = _block_indicator(N, nb, w_flat.dtype)
    ts = jax.lax.dot_general(w_flat, B, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)  # (1, nb)
    cdf = _lane_cumsum(ts, nb, roll)
    total = jax.lax.slice(cdf, (0, nb - 1), (1, nb))       # (1, 1)
    t1 = u_t * jnp.broadcast_to(total, u_t.shape)          # (128, 1)
    cdf_b = jnp.broadcast_to(cdf, (u_t.shape[0], nb))
    t1_b = jnp.broadcast_to(t1, (u_t.shape[0], nb))
    below = cdf_b < t1_b
    blk = jnp.clip(jnp.sum(below.astype(jnp.int32), axis=1, keepdims=True),
                   0, nb - 1)
    ts_b = jnp.broadcast_to(ts, (u_t.shape[0], nb))
    prev = jnp.sum(jnp.where(below, ts_b, jnp.zeros_like(ts_b)), axis=1,
                   keepdims=True)
    prev = jnp.minimum(prev, t1)                           # guard f32 order
    oh1 = (jnp.broadcast_to(blk, (u_t.shape[0], nb))
           == jax.lax.broadcasted_iota(jnp.int32, (u_t.shape[0], nb), 1)
           ).astype(w_flat.dtype)
    w2 = jnp.exp(rl2 - jnp.broadcast_to(m, rl2.shape))     # (nb, 128)
    wt = jax.lax.dot_general(oh1, w2, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)  # (128, 128)
    ic = _lane_cumsum(wt, wt.shape[1], roll)
    rem = jnp.broadcast_to(t1 - prev, wt.shape)
    off = jnp.clip(jnp.sum((ic < rem).astype(jnp.int32), axis=1,
                           keepdims=True), 0, wt.shape[1] - 1)
    return blk * wt.shape[1] + off                         # (128, 1) int32


def _stage2_cols(rows_d, payload, cf2, cb2, seed, seed_blk, pair, draws, nb,
                 k, roll):
    """Block + within-block column draws for one 128-draw block.

    rows_d (128, 1) sampled rows; payload (N, nb + k) = [Lb | rf]; cf2
    (k, nb, 128); cb2 (nb, 128). Counter streams match `blocked_col_sample`
    exactly: u_blk on (seed_blk, pair, nb, draw, 0), u_in on
    (seed, pair, draw, block, j_loc)."""
    n_draw = rows_d.shape[0]
    N = payload.shape[0]
    ohr = (jnp.broadcast_to(rows_d, (n_draw, N))
           == jax.lax.broadcasted_iota(jnp.int32, (n_draw, N), 1)
           ).astype(payload.dtype)
    pay = jax.lax.dot_general(ohr, payload, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
    Lb_sel = jax.lax.slice(pay, (0, 0), (n_draw, nb))      # (128, nb)
    rf_sel = jax.lax.slice(pay, (0, nb), (n_draw, nb + k)) # (128, k)

    u_blk = counter_uniform(seed_blk, jnp.broadcast_to(pair, draws.shape),
                            jnp.full_like(draws, nb), draws,
                            jnp.zeros_like(draws))          # (128, 1)
    m2 = jnp.max(Lb_sel, axis=1, keepdims=True)
    wb = jnp.exp(Lb_sel - m2)
    cdf2 = _lane_cumsum(wb, nb, roll)
    tot2 = jax.lax.slice(cdf2, (0, nb - 1), (n_draw, nb))
    tgt = jnp.broadcast_to(u_blk * tot2, cdf2.shape)
    blk2 = jnp.clip(jnp.sum((cdf2 < tgt).astype(jnp.int32), axis=1,
                            keepdims=True), 0, nb - 1)      # (128, 1)

    oh2 = (jnp.broadcast_to(blk2, (n_draw, nb))
           == jax.lax.broadcasted_iota(jnp.int32, (n_draw, nb), 1)
           ).astype(payload.dtype)
    s2 = jax.lax.dot_general(oh2, cb2, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)  # (128, 128)
    nblk_w = s2.shape[1]
    for kk in range(k):
        cfk = cf2[kk]                                      # (nb, 128)
        sel = jax.lax.dot_general(oh2, cfk, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)
        rfk = jax.lax.slice(rf_sel, (0, kk), (n_draw, kk + 1))
        s2 = s2 + jnp.broadcast_to(rfk, (n_draw, nblk_w)) * sel

    j_loc = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1)
    u_in = counter_uniform(seed, jnp.broadcast_to(pair, s2.shape),
                           jnp.broadcast_to(draws, s2.shape),
                           jnp.broadcast_to(blk2, s2.shape), j_loc)
    g = s2 - jnp.log(-jnp.log(u_in))
    m3 = jnp.max(g, axis=1, keepdims=True)
    j_star = jnp.min(jnp.where(g >= jnp.broadcast_to(m3, g.shape), j_loc,
                               jnp.full_like(j_loc, nblk_w)),
                     axis=1, keepdims=True)
    return blk2 * _COL_BLOCK + j_star                      # (128, 1) int32


def _stitch_draws_kernel(smem_ref, rl_flat_ref, rl2_ref, u_ref, payload_ref,
                         cf2_ref, cb2_ref, rows_ref, cols_ref, *, k, nb):
    pair = pl.program_id(0) + smem_ref[1]
    c = pl.program_id(1)
    n_draw = u_ref.shape[2]
    draws = (c * n_draw
             + jax.lax.broadcasted_iota(jnp.int32, (n_draw, 1), 0))
    roll = lambda z, s: pltpu.roll(z, s, axis=z.ndim - 1)

    rows_d = _stage1_rows(rl_flat_ref[0], rl2_ref[0], u_ref[0, 0], nb, roll)
    cols_d = _stage2_cols(rows_d, payload_ref[0], cf2_ref[0], cb2_ref[0],
                          smem_ref[0], smem_ref[2], pair, draws, nb, k, roll)
    rows_ref[0, 0] = rows_d
    cols_ref[0, 0] = cols_d


def _seed_blk(seed):
    return _mix32(jnp.asarray(seed, jnp.int32).astype(jnp.uint32)
                  ^ jnp.uint32(0x5BD1E995)).astype(jnp.int32)


def stitch_draws(seed, row_logits, u_rows, Lb, rf, cf, cb, *, pair_offset=0,
                 interpret=False):
    """Fused stage-1 row draws + stage-2 column draws for one tree level.

    seed int32 scalar; row_logits (P, N) = row_bias + row_lse; u_rows (P, N)
    stage-1 uniforms; Lb (P, N, nb) block masses; rf/cf (P, N, k); cb (P, N)
    -> (rows, cols), each (P, N) int32. Pair 0 pinning is the caller's job.
    Law: hierarchical inverse-CDF row draw (as `categorical_from_uniforms`),
    exact two-stage P(j | i) = P(block | i) P(j | i, block) column draw with
    the same counter streams as `blocked_col_sample`."""
    P, N, k = rf.shape
    assert N % _COL_BLOCK == 0 and Lb.shape == (P, N, N // _COL_BLOCK)
    nb = N // _COL_BLOCK
    nblk = N // _ROW_BLOCK
    # One-hot matmul selection turns -inf payload entries into NaN
    # (0 * -inf); clamp to a finite floor that still underflows to exactly 0
    # through exp. (Indicator potentials, e.g. the rare-event model, emit
    # -inf biases.)
    Lb = jnp.maximum(Lb, _NEG_FLOOR)
    cb = jnp.maximum(cb, _NEG_FLOOR)
    smem = jnp.stack([jnp.asarray(seed, jnp.int32).reshape(()),
                      jnp.asarray(pair_offset, jnp.int32).reshape(()),
                      _seed_blk(seed).reshape(())])
    payload = jnp.concatenate([Lb, rf], axis=-1)            # (P, N, nb + k)
    cf2 = jnp.swapaxes(cf, 1, 2).reshape(P, k, nb, _COL_BLOCK)
    out_shape = [jax.ShapeDtypeStruct((P, nblk, _ROW_BLOCK, 1), jnp.int32),
                 jax.ShapeDtypeStruct((P, nblk, _ROW_BLOCK, 1), jnp.int32)]
    rows, cols = pl.pallas_call(
        functools.partial(_stitch_draws_kernel, k=k, nb=nb),
        grid=(P, nblk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, N), lambda p, c: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, _ROW_BLOCK), lambda p, c: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _ROW_BLOCK, 1), lambda p, c: (p, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, nb + k), lambda p, c: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, nb, _COL_BLOCK), lambda p, c: (p, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, _COL_BLOCK), lambda p, c: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, _ROW_BLOCK, 1), lambda p, c: (p, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _ROW_BLOCK, 1), lambda p, c: (p, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(smem, row_logits[:, None, :],
      row_logits.reshape(P, nb, _ROW_BLOCK),
      u_rows.reshape(P, nblk, _ROW_BLOCK)[..., None],
      payload, cf2, cb.reshape(P, nb, _COL_BLOCK))
    return rows.reshape(P, N), cols.reshape(P, N)


def stitch_draws_xla(seed, row_logits, u_rows, Lb, rf, cf, cb, pair_offset=0):
    """XLA twin of `stitch_draws`: same counter streams and the same
    shift-add CDF association, vectorised over (P, N) draws."""
    P, N, k = rf.shape
    nb = N // _COL_BLOCK
    roll = lambda z, s: jnp.roll(z, s, axis=-1)
    seed = jnp.asarray(seed, jnp.int32)
    Lb = jnp.maximum(Lb, _NEG_FLOOR)      # match the kernel's -inf clamp
    cb = jnp.maximum(cb, _NEG_FLOOR)

    # Stage 1 (tile CDF + within-tile offset, shared association).
    m = jnp.max(row_logits, axis=-1, keepdims=True)
    w = jnp.exp(row_logits - m)                             # (P, N)
    B = _block_indicator(N, nb, w.dtype)
    ts = jax.lax.dot_general(w, B, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)  # (P, nb)
    cdf = _lane_cumsum(ts, nb, roll)
    t1 = u_rows * cdf[:, -1:]                               # (P, N)
    below = cdf[:, None, :] < t1[:, :, None]                # (P, N, nb)
    blk = jnp.clip(jnp.sum(below.astype(jnp.int32), axis=-1), 0, nb - 1)
    prev = jnp.sum(jnp.where(below, ts[:, None, :], 0.0), axis=-1)
    prev = jnp.minimum(prev, t1)
    wt = w.reshape(P, nb, _ROW_BLOCK)
    oh1 = jax.nn.one_hot(blk, nb, dtype=w.dtype)            # (P, N, nb)
    sel = jnp.einsum("pnb,pbj->pnj", oh1, wt,
                     precision=jax.lax.Precision.HIGHEST)   # (P, N, 128)
    ic = _lane_cumsum(sel, _ROW_BLOCK, roll)
    off = jnp.clip(jnp.sum((ic < (t1 - prev)[:, :, None]).astype(jnp.int32),
                           axis=-1), 0, _ROW_BLOCK - 1)
    rows = (blk * _ROW_BLOCK + off).astype(jnp.int32)       # (P, N)

    # Stage 2 (same as blocked_col_sample, shared association).
    pair_ids = (jnp.arange(P, dtype=jnp.int32)
                + jnp.asarray(pair_offset, jnp.int32))[:, None]
    draw_ids = jnp.arange(N, dtype=jnp.int32)[None, :]
    u_blk = counter_uniform(_seed_blk(seed), pair_ids, jnp.int32(nb),
                            draw_ids, jnp.zeros_like(draw_ids))
    Lb_sel = jnp.take_along_axis(Lb, rows[:, :, None], axis=1)
    m2 = jnp.max(Lb_sel, axis=-1, keepdims=True)
    wb = jnp.exp(Lb_sel - m2)
    cdf2 = _lane_cumsum(wb, nb, roll)
    tgt = (u_blk * cdf2[..., -1])[..., None]
    blocks = jnp.clip(jnp.sum((cdf2 < tgt).astype(jnp.int32), axis=-1),
                      0, nb - 1).astype(jnp.int32)          # (P, N)

    rf_sel = jnp.take_along_axis(rf, rows[:, :, None], axis=1)
    cf_blk = cf.reshape(P, nb, _COL_BLOCK, k)
    cf_sel = jnp.take_along_axis(cf_blk, blocks[:, :, None, None], axis=1)
    cb_blk = cb.reshape(P, nb, _COL_BLOCK)
    cb_sel = jnp.take_along_axis(cb_blk, blocks[:, :, None], axis=1)
    s2 = jnp.einsum("pnk,pnjk->pnj", rf_sel, cf_sel,
                    precision=jax.lax.Precision.HIGHEST) + cb_sel
    j_loc = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 2)
    u_in = counter_uniform(seed, pair_ids[..., None], draw_ids[..., None],
                           blocks[:, :, None], j_loc)
    g = s2 - jnp.log(-jnp.log(u_in))
    j_star = jnp.argmax(g, axis=-1).astype(jnp.int32)
    return rows, (blocks * _COL_BLOCK + j_star).astype(jnp.int32)


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
