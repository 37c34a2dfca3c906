"""TPU-fast batched gathers and categorical draws.

XLA lowers `jnp.take_along_axis` with a size-1 minor dimension to a scalar
gather that runs at ~5e7 elements/s on TPU (measured round 2), while gathers
whose minor dimension is a contiguous 128-lane tile run at full HBM speed
(>3 orders of magnitude faster). `take_rows` therefore gathers the 128-wide
*tile* containing each index and resolves the within-tile offset with a
one-hot reduce — trading 128x HBM inflation (~1ms/GB) for the scalar-gather
path (~20ms/M-element).

`categorical_from_uniforms` applies the same idea to N-way inverse-CDF
draws: `jnp.searchsorted`'s scan lowering cost 292 ms for (512, 4096)
draws on a v5e; the hierarchical tile-CDF version is the *same* inverse-CDF
draw (up to f32 summation association) in a few ms.

No reference counterpart — this layer exists because of TPU gather
semantics (reference relies on XLA:GPU gathers, e.g.
`_primitives/csmc/pit/operator.py:95-111`).
"""
import os

import jax
import jax.numpy as jnp

_TILE = 128
_HI = jax.lax.Precision.HIGHEST

# Inclusive prefix-sum matrix: (w @ _TRI)[j] = sum_{i <= j} w[i]. A 128-wide
# MXU matmul replaces the 7-pass log-shift cumsum lowering over per-draw
# tiles (measured 1.3x whole-draw win at the PIT N=4096 shapes).
_TRI = None


def _tri():
    # NumPy, not jnp: a jnp array built during a trace would cache a tracer.
    global _TRI
    if _TRI is None:
        import numpy as _np
        _TRI = _np.triu(_np.ones((_TILE, _TILE), _np.float32))
    return _TRI


def _prefix_tile(x):
    """Inclusive prefix sums over the last (TILE-wide) axis via MXU matmul.
    HIGHEST precision keeps f32 products exact (bf16 hi/mid/lo split); the
    summation association differs from `cumsum`, which only permutes f32
    rounding — both are valid CDF associations for inverse-CDF draws.

    (Round-4 A/B: a manual 3-pass bf16-split at DEFAULT precision is 2.4x
    SLOWER than one HIGHEST matmul here — XLA re-materialises the one-hot /
    triangle operand per pass instead of fusing the iota-compare once.)"""
    return jax.lax.dot_general(x, _tri().astype(x.dtype),
                               (((x.ndim - 1,), (0,)), ((), ())),
                               precision=_HI)


def _select_tile_rows(mat, idx):
    """Exact per-draw row selection mat[..., idx, :] as a one-hot MXU matmul.
    mat (..., R, C), idx (..., n) -> (..., n, C). XLA fuses the one-hot
    iota-compare into the matmul operand, so nothing (..., n, R) hits HBM;
    measured 2.3x over the `take_along_axis` row-gather lowering at
    (512, 4096, 128)-ish shapes.

    Opt-in (AUX_SSM_PLANE_SELECT=1) BIT-EXACT bf16 lowering: a one-hot
    contraction selects exactly one row, so each output element is a single
    product `1.0 * mat[r, c]` — exact as long as the operand planes are
    exact. f32 `mat` is split into three bf16 planes (hi = bf16(x),
    mid = bf16(x - hi), lo = x - hi - mid; the third residual fits bf16
    exactly: <= 6 significant bits left of a 24-bit mantissa), CONCATENATED
    along the width so ONE default-precision bf16 matmul serves all three,
    and the planes are re-added on the VPU — bit-identical to the HIGHEST
    f32 matmul (disjoint mantissa windows of <= 24 bits total) for
    |x| >= ~2^-110; below that the mid/lo residual planes fall under
    bf16's smallest subnormal (~2^-133) and flush to zero, so values with
    magnitude < ~2^-133 select as 0.0 (callers select exp(logits - max)
    weights, where such entries carry probability 0 in f32 anyway).

    Default OFF: in-graph, XLA does NOT fuse the one-hot iota-compare into
    a bf16 matmul the way it does for the f32 HIGHEST one — it materialises
    the (..., n, R) one-hot in HBM (4.3 GB at the PIT N=4096 stage-1
    shapes), and the whole PIT step measured 2x SLOWER (153 -> 311 ms/step,
    same-session A/B, benchmarks/RESULTS_r4.md). Kept for in-kernel use
    where operands are VMEM-resident (see
    `ops/pallas/stitching._block_masses_kernel`, where the same 3-plane
    trick IS a win because nothing round-trips HBM).
    """
    R = mat.shape[-2]
    b = tuple(range(mat.ndim - 2))
    if (mat.dtype != jnp.float32 or not _use_tile_path()
            or os.environ.get("AUX_SSM_PLANE_SELECT", "0") != "1"):
        oh = jax.nn.one_hot(idx, R, dtype=mat.dtype)
        return jax.lax.dot_general(oh, mat, (((oh.ndim - 1,), (mat.ndim - 2,)),
                                             (b, b)), precision=_HI)
    C = mat.shape[-1]
    hi = mat.astype(jnp.bfloat16)
    r1 = mat - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    planes = jnp.concatenate([hi, mid, lo], axis=-1)         # (..., R, 3C)
    oh = jax.nn.one_hot(idx, R, dtype=jnp.bfloat16)
    sel = jax.lax.dot_general(
        oh, planes, (((oh.ndim - 1,), (planes.ndim - 2,)), (b, b)),
        preferred_element_type=jnp.float32)                  # (..., n, 3C)
    return (sel[..., :C] + sel[..., C:2 * C]) + sel[..., 2 * C:]


def _use_tile_path():
    flag = os.environ.get("AUX_SSM_FAST_TAKE", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:  # pragma: no cover
        return False
    return platform in ("tpu", "axon")


def take_rows(vals, idx, index_payload=False):
    """Batched `vals[..., idx, :]` along the second-to-last (or last) axis.

    vals (..., N) or (..., N, d); idx (..., n) int32 with matching leading
    batch dims. Returns (..., n) or (..., n, d). Exact — same values as
    `jnp.take_along_axis`; on TPU uses the tile-gather + one-hot-reduce
    lowering when N is a multiple of 128.

    `index_payload=True` promises integer payload VALUES are < 2^24 in
    magnitude (e.g. genealogy maps holding indices < N), enabling a one-hot
    f32 matmul selection. Without the promise, >=32-bit integer payloads use
    the always-exact tile gather: the f32 round-trip would silently corrupt
    values past 2^24 (16_777_217 -> 16_777_216).
    """
    vec = vals.ndim == idx.ndim          # (..., N) scalar-valued case
    if vec:
        vals = vals[..., None]
    N = vals.shape[-2]
    f32_exact = index_payload or (jnp.issubdtype(vals.dtype, jnp.integer)
                                  and vals.dtype.itemsize <= 2)
    if not _use_tile_path() or N % _TILE != 0:
        out = jnp.take_along_axis(vals, idx[..., None], axis=-2)
    elif jnp.issubdtype(vals.dtype, jnp.integer) and f32_exact:
        # Integer payloads with values exact in f32: one-hot matmul
        # selection beats the tile gather (measured 1.26x at (512, 4096)
        # int32 genealogy maps).
        out = jnp.round(_select_tile_rows(vals.astype(jnp.float32), idx)
                        ).astype(vals.dtype)
    else:
        nb = N // _TILE
        d = vals.shape[-1]
        tiles = vals.reshape(vals.shape[:-2] + (nb, _TILE, d))
        t = (idx >> 7)[..., None, None]                      # (..., n, 1, 1)
        sel = jnp.take_along_axis(tiles, t, axis=-3)         # (..., n, TILE, d)
        off = (idx & (_TILE - 1))[..., None]
        lane = jax.lax.broadcasted_iota(jnp.int32, sel.shape[:-1],
                                        sel.ndim - 2)        # (..., n, TILE)
        mask = (lane == off)[..., None]
        out = jnp.sum(jnp.where(mask, sel, jnp.zeros_like(sel)), axis=-2)
    return out[..., 0] if vec else out


def categorical_from_uniforms(logits, u):
    """n iid inverse-CDF categorical draws over N from unnormalised
    log-probs. logits (..., N); u (..., n) uniforms in (0, 1) -> (..., n)
    int32. The flat CDF is decomposed hierarchically (tile CDF, then the
    conditional offset within the chosen tile) so no `searchsorted` scan
    and no scalar gather is emitted. Past N = TILE^2 a third (super-tile)
    level keeps every comparison tensor <= (..., n, TILE).
    """
    N = logits.shape[-1]
    if not _use_tile_path() or N % _TILE != 0:
        return _flat_inverse_cdf(logits, u)
    nb = N // _TILE
    m = jnp.max(logits, axis=-1, keepdims=True)
    w = jnp.exp(logits - m)                                  # (..., N)
    wt = w.reshape(w.shape[:-1] + (nb, _TILE))
    tile_sum = jnp.sum(wt, axis=-1)                          # (..., nb)
    if nb > _TILE:
        return _three_level_draw(wt, tile_sum, u)[0]
    tile_cdf = jnp.cumsum(tile_sum, axis=-1)
    total = tile_cdf[..., -1:]
    t = u * total                                            # (..., n)
    below = tile_cdf[..., None, :] < t[..., None]            # (..., n, nb)
    blk = jnp.sum(below.astype(jnp.int32), axis=-1)
    blk = jnp.clip(blk, 0, nb - 1)
    # CDF mass strictly before the chosen tile, without a scalar gather.
    prev = jnp.sum(jnp.where(below, tile_sum[..., None, :], 0.0), axis=-1)
    prev = jnp.minimum(prev, t)                              # guard f32 order
    sel = _select_tile_rows(wt, blk)                         # (..., n, TILE)
    in_cdf = _prefix_tile(sel)
    off = jnp.sum((in_cdf < (t - prev)[..., None]).astype(jnp.int32), axis=-1)
    off = jnp.clip(off, 0, _TILE - 1)
    return (blk * _TILE + off).astype(jnp.int32)


def _three_level_draw(wt, tile_sum, u, tile_payload=None):
    """Inverse-CDF draws when the tile count itself exceeds one tile: group
    the nb tile sums into super-tiles of TILE, draw super -> tile -> offset.
    Zero-padded super/tile slots carry zero mass, so the strict `cdf < t`
    counts can never select them (guarded by the clamps regardless).

    All per-draw row selections are one-hot MXU matmuls and all per-draw
    prefix sums are `_prefix_tile` matmuls — no (..., n)-indexed gathers
    (measured 2.3x over the gather/cumsum formulation at (512, 131072)).

    wt (..., nb, TILE) tile-reshaped weights; tile_sum (..., nb); u (..., n);
    `tile_payload` (..., nb, q), optional -> returns (idx, payload_sel) with
    payload_sel (..., n, q) = tile_payload[..., idx // TILE, :], selected by
    the same one-hot matmul as the weight tile (exact; rides the contraction
    for ~free instead of a separate per-draw gather).
    """
    nb = tile_sum.shape[-1]
    ns = -(-nb // _TILE)
    pad = ns * _TILE - nb
    lead = tile_sum.shape[:-1]
    ts_p = jnp.pad(tile_sum, [(0, 0)] * len(lead) + [(0, pad)])
    tss = ts_p.reshape(lead + (ns, _TILE))                   # (..., ns, TILE)
    sup_sum = jnp.sum(tss, axis=-1)                          # (..., ns)
    sup_cdf = jnp.cumsum(sup_sum, axis=-1)
    total = sup_cdf[..., -1:]
    t = u * total                                            # (..., n)

    below_s = sup_cdf[..., None, :] < t[..., None]           # (..., n, ns)
    sup = jnp.clip(jnp.sum(below_s.astype(jnp.int32), axis=-1), 0, ns - 1)
    prev_s = jnp.sum(jnp.where(below_s, sup_sum[..., None, :], 0.0), axis=-1)
    prev_s = jnp.minimum(prev_s, t)                          # guard f32 order
    rem_s = t - prev_s                                       # (..., n)

    ts_sel = _select_tile_rows(tss, sup)                     # (..., n, TILE)
    mid_cdf = _prefix_tile(ts_sel)
    below_m = mid_cdf < rem_s[..., None]
    mid = jnp.clip(jnp.sum(below_m.astype(jnp.int32), axis=-1), 0, _TILE - 1)
    prev_m = jnp.sum(jnp.where(below_m, ts_sel, 0.0), axis=-1)
    prev_m = jnp.minimum(prev_m, rem_s)
    blk = jnp.minimum(sup * _TILE + mid, nb - 1)             # (..., n)

    if tile_payload is not None:
        q = tile_payload.shape[-1]
        both = jnp.concatenate([wt, tile_payload.astype(wt.dtype)], axis=-1)
        sel = _select_tile_rows(both, blk)                   # (..., n, TILE+q)
        w_sel, payload_sel = sel[..., :_TILE], sel[..., _TILE:]
    else:
        w_sel = _select_tile_rows(wt, blk)                   # (..., n, TILE)
        payload_sel = None
    in_cdf = _prefix_tile(w_sel)
    off = jnp.sum((in_cdf < (rem_s - prev_m)[..., None]).astype(jnp.int32),
                  axis=-1)
    off = jnp.clip(off, 0, _TILE - 1)
    return (blk * _TILE + off).astype(jnp.int32), payload_sel


def _flat_inverse_cdf(logits, u):
    """searchsorted-based fallback (CPU, or N not tile-aligned); memory-lean
    — never materialises an (n, N) comparison."""
    m = jnp.max(logits, axis=-1, keepdims=True)
    cdf = jnp.cumsum(jnp.exp(logits - m), axis=-1)
    target = u * cdf[..., -1:]
    N = logits.shape[-1]
    if logits.ndim == 1:
        idx = jnp.searchsorted(cdf, target)
    else:
        flat_cdf = cdf.reshape(-1, N)
        flat_t = target.reshape(-1, target.shape[-1])
        idx = jax.vmap(jnp.searchsorted)(flat_cdf, flat_t).reshape(u.shape)
    return jnp.clip(idx, 0, N - 1).astype(jnp.int32)
