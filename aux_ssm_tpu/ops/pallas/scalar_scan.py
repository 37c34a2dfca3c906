"""Fused Pallas scans for the batched scalar-filter layout (dx = dy = 1).

The spatial model family runs B independent 1-D LGSSMs in the batched
`(T, B, 1, 1)` layout (reference contract `_primitives/kalman/base.py:27-49`).
Its filtering/sampling elements are plain scalars per (t, b), so the whole
parallel-in-time scan is elementwise algebra on `(T, B)` arrays — a perfect
VPU workload. These kernels map B onto the 128-wide vector lanes and T onto
sublanes, run a block-local Hillis–Steele inclusive scan over T inside VMEM,
and chain T-blocks through a carry scratch over a sequential grid axis
(B-blocks ride the outer, parallel grid axis).

Unlike `filter_scan.py` (lanes = time, d x d matrices as row lists), the
scalar case needs no lane-major matrix representation: every combine is a
handful of `(TB, LANES)` elementwise ops, and `pltpu.roll` over the sublane
axis provides the scan shifts.
"""
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_slice = jax.lax.slice_in_dim

LANES = 128
_T_BLOCK = 512
_S = 8           # positions per chunk of the work-efficient kernel


def _filter_combine(left, right):
    """Scalar form of `ops.filtering.filtering_operator` (SGF 2021 Lemma 8):
    the (I + C1 J2) inverse is a reciprocal."""
    A1, b1, C1, e1, J1 = left
    A2, b2, C2, e2, J2 = right
    Z = 1.0 / (1.0 + C1 * J2)
    A2Z = A2 * Z
    ZA1 = Z * A1
    A = A2Z * A1
    b = A2Z * (b1 + C1 * e2) + b2
    C = A2Z * C1 * A2 + C2
    e = ZA1 * (e2 - J2 * b1) + e1
    J = ZA1 * J2 * A1 + J1
    return A, b, C, e, J


def _affine_combine(left, right):
    """Scalar affine composition op(prefix, local) = (g2 g1, g2 e1 + e2)."""
    g1, e1 = left
    g2, e2 = right
    return g2 * g1, g2 * e1 + e2


_FILTER_IDENT = (1.0, 0.0, 0.0, 0.0, 0.0)
_AFFINE_IDENT = (1.0, 0.0)


def _scan_kernel(*refs, combine, identity, n, tb, levels):
    """Generic n-array scalar block scan. Grid = (B_blocks, T_blocks); the
    T axis is the minor (sequential) grid dimension, so the per-B-block
    carry scratch threads the prefix across T-blocks."""
    ins, outs, carries = refs[:n], refs[n:2 * n], refs[2 * n:]
    ti = pl.program_id(1)

    vals = [r[:] for r in ins]
    row = jax.lax.broadcasted_iota(jnp.int32, (tb, 1), 0)
    s = 1
    for _ in range(levels):
        left = [pltpu.roll(v, s, axis=0) for v in vals]
        new = combine(left, vals)
        m = row >= s
        vals = [jnp.where(m, nv, v) for nv, v in zip(new, vals)]
        s *= 2

    @pl.when(ti == 0)
    def _():
        for c, ident in zip(carries, identity):
            c[:] = jnp.full(c.shape, ident, dtype=c.dtype)

    carry = [c[:] for c in carries]          # (1, LANES), broadcasts over rows
    vals = list(combine(carry, vals))

    for o, v in zip(outs, vals):
        o[:] = v
    for c, v in zip(carries, vals):
        c[:] = _slice(v, tb - 1, tb, axis=0)


def _chunked_scan_kernel(*refs, combine, identity, n, S, R):
    """Work-efficient two-level scalar scan: one (t-block, b-block) grid
    step covers S*R consecutive t laid out chunk-major (sublane c of
    position ref [s] holds t = block*S*R + c*S + s). (S-1) sequential
    within-chunk prefix combines + log2(R) Hillis-Steele levels over the R
    chunk totals + (S+1) carry/apply combines — ~3.2x fewer element-ops
    than the 9-level Hillis-Steele at tb=512 (same combine algebra; see
    `filter_scan._chunked_scan_kernel` for the dense counterpart)."""
    ins, outs, carries = refs[:n], refs[n:2 * n], refs[2 * n:]
    ti = pl.program_id(1)

    # Pass 1: within-chunk inclusive prefixes, parked in the out refs.
    prefix = [r[0, 0] for r in ins]
    for o, v in zip(outs, prefix):
        o[0, 0] = v
    for s in range(1, S):
        prefix = list(combine(prefix, [r[s, 0] for r in ins]))
        for o, v in zip(outs, prefix):
            o[s, 0] = v

    # Pass 2: Hillis-Steele over the R chunk totals (sublane axis).
    vals = prefix
    row = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    sh = 1
    while sh < R:
        left = [pltpu.roll(v, sh, axis=0) for v in vals]
        new = combine(left, vals)
        m = row >= sh
        vals = [jnp.where(m, nv, v) for nv, v in zip(new, vals)]
        sh *= 2

    # Exclusive chunk prefix (identity at row 0) combined with the
    # cross-T-block carry.
    is0 = row == 0
    excl = [jnp.where(is0, jnp.full_like(v, ident), pltpu.roll(v, 1, axis=0))
            for v, ident in zip(vals, identity)]

    @pl.when(ti == 0)
    def _():
        for c, ident in zip(carries, identity):
            c[:] = jnp.full(c.shape, ident, dtype=c.dtype)

    carry = [c[:] for c in carries]          # (1, LANES), broadcasts
    pre = list(combine(carry, excl))

    # Pass 3: out[s] = pre o within-chunk-prefix[s].
    for s in range(S):
        vals_s = list(combine(pre, [o[s, 0] for o in outs]))
        for o, v in zip(outs, vals_s):
            o[s, 0] = v

    # New carry = last chunk's full prefix (position S-1, row R-1).
    for c, o in zip(carries, outs):
        c[:] = _slice(o[S - 1, 0], R - 1, R, axis=0)


def _chunked_block_scan(arrays, combine, identity, interpret):
    """Chunk-major entry for `_chunked_scan_kernel` over (T, B) arrays."""
    n = len(arrays)
    T, B = arrays[0].shape
    dtype = arrays[0].dtype
    S = _S
    R = _T_BLOCK // S
    TB = S * R
    Tp = ((T + TB - 1) // TB) * TB
    Bp = ((B + LANES - 1) // LANES) * LANES
    nt = Tp // TB
    padded = []
    for z, ident in zip(arrays, identity):
        z = jnp.pad(z, ((0, Tp - T), (0, Bp - B)), constant_values=ident)
        # (Tp, B) -> (S, nt, R, B); t = blk*TB + c*S + s.
        z = z.reshape(nt, R, S, Bp).transpose(2, 0, 1, 3)
        padded.append(z)

    spec = pl.BlockSpec((S, 1, R, LANES), lambda j, i: (0, i, 0, j),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_chunked_scan_kernel, combine=combine,
                          identity=identity, n=n, S=S, R=R),
        grid=(Bp // LANES, nt),
        out_shape=tuple(jax.ShapeDtypeStruct((S, nt, R, Bp), dtype)
                        for _ in range(n)),
        in_specs=[spec] * n,
        out_specs=tuple([spec] * n),
        scratch_shapes=[pltpu.VMEM((1, LANES), dtype) for _ in range(n)],
        interpret=interpret,
    )(*padded)
    return tuple(z.transpose(1, 2, 0, 3).reshape(Tp, Bp)[:T, :B]
                 for z in out)


def _scalar_mode():
    return os.environ.get("AUX_SSM_SCALAR_SCAN", "auto")


def _block_scan(arrays, combine, identity, interpret):
    """Inclusive scan over axis 0 of `(T, B)` arrays with `combine`."""
    n = len(arrays)
    T, B = arrays[0].shape
    dtype = arrays[0].dtype

    mode = _scalar_mode()
    if mode != "hs" and (mode == "chunked" or T >= _T_BLOCK):
        return _chunked_block_scan(arrays, combine, identity, interpret)

    tb = min(_T_BLOCK, max(8, 1 << (T - 1).bit_length()))
    Tp = ((T + tb - 1) // tb) * tb
    Bp = ((B + LANES - 1) // LANES) * LANES
    padded = []
    for z, ident in zip(arrays, identity):
        z = jnp.pad(z, ((0, Tp - T), (0, Bp - B)), constant_values=ident)
        padded.append(z)

    spec = pl.BlockSpec((tb, LANES), lambda i, j: (j, i),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_scan_kernel, combine=combine, identity=identity,
                          n=n, tb=tb, levels=tb.bit_length() - 1),
        grid=(Bp // LANES, Tp // tb),
        out_shape=tuple(jax.ShapeDtypeStruct((Tp, Bp), dtype) for _ in range(n)),
        in_specs=[spec] * n,
        out_specs=tuple([spec] * n),
        scratch_shapes=[pltpu.VMEM((1, LANES), dtype) for _ in range(n)],
        interpret=interpret,
    )(*padded)
    return tuple(z[:T, :B] for z in out)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_scalar_filter_scan(elems, interpret=False):
    """Scan of scalar filtering elements; `elems = (A, b, C, eta, J)`, each
    `(T, B)`. Equivalent to `associative_scan(filtering_operator, ...)` on the
    `(T, B, 1, 1)` layout, squeezed."""
    return _block_scan(list(elems), _filter_combine, _FILTER_IDENT, interpret)


@functools.partial(jax.jit, static_argnames=("reverse", "interpret"))
def fused_scalar_affine_scan(gains, incs, reverse=False, interpret=False):
    """Scan of scalar affine maps (g, e), shapes `(T, B)`. Equivalent to
    `associative_scan(sampling_operator, ..., reverse=...)`, squeezed."""
    if reverse:
        gains, incs = gains[::-1], incs[::-1]
    g, e = _block_scan([gains, incs], _affine_combine, _AFFINE_IDENT, interpret)
    if reverse:
        g, e = g[::-1], e[::-1]
    return g, e


def vmem_estimate_bytes(T, B, dtype_bytes=4):
    tb = min(_T_BLOCK, max(8, 1 << (max(T, 2) - 1).bit_length()))
    return 12 * tb * LANES * dtype_bytes
