"""Fused parallel-in-time Kalman filter scan as a single Pallas TPU kernel.

The XLA `associative_scan` path materialises the five element tensors in HBM
at every one of the log2(T) combine levels and lowers each small-matrix
inverse through generic batched linalg. This kernel keeps all elements
resident in VMEM in a lane-major layout — the time axis rides the 128-wide
vector lanes — and performs the whole Hillis–Steele inclusive scan (log2(T)
unrolled levels) in one launch.

Mosaic representation: a (d, d) matrix batched over T lanes is a Python list
of d arrays of shape (d, T) (matrix row i; first axis = column index). All
algebra then reduces to 2-D ops with only (1, T) x (d, T) single-side
broadcasts — the dual-broadcast 3-D form (d,1,T)*(1,d,T) miscompiles on
current Mosaic, and value scatters/gathers are unsupported. d is static and
small, so the d^2-unrolled loops trace a few thousand cheap VPU ops per
level.

The matrix inverse is Gauss–Jordan without pivoting; the operand I + C1 J2
is similar to I + SPD (eigenvalues >= 1) and well-behaved; correctness vs
the XLA path is covered by tests (interpret mode) and on-hardware checks.
"""
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_slice = jax.lax.slice_in_dim


from . import lanelin as ll


def _combine(left, right, d, T):
    """`filtering_operator` algebra on row lists (see ops/filtering.py):
    one Gauss–Jordan inverse of I + C1 J2 serves both solve occurrences."""
    A1, b1, C1, e1, J1 = left
    A2, b2, C2, e2, J2 = right

    M = ll.mat_add(ll.mat_mul(C1, J2), ll.mat_eye(d, T, b1.dtype))
    Z = ll.gj_inv(M, d, T)

    A2Z = ll.mat_mul(A2, Z)
    ZA1 = ll.mat_mul(Z, A1)
    ZA1T = ll.mat_transpose(ZA1)
    A2T = ll.mat_transpose(A2)

    A = ll.mat_mul(A2Z, A1)
    b = ll.mat_vec(A2Z, b1 + ll.mat_vec(C1, e2)) + b2
    C = ll.mat_add(ll.mat_mul(A2Z, ll.mat_mul(C1, A2T)), C2)
    e = ll.mat_vec(ZA1T, e2 - ll.mat_vec(J2, b1)) + e1
    J = ll.mat_add(ll.mat_mul(ZA1T, ll.mat_mul(J2, A1)), J1)

    return A, b, ll.mat_sym(C), e, ll.mat_sym(J)


def _roll_mat(rows, s):
    return [pltpu.roll(r, s, axis=1) for r in rows]


def _replicate_last_lane(row, B):
    """(d, B) -> (d, B) with every lane holding the value of lane B-1."""
    return jnp.broadcast_to(_slice(row, B - 1, B, axis=1), row.shape)


def _scan_kernel(A_ref, b_ref, C_ref, e_ref, J_ref,
                 oA_ref, ob_ref, oC_ref, oe_ref, oJ_ref,
                 cA_ref, cb_ref, cC_ref, ce_ref, cJ_ref, *, d, B, levels):
    """One grid step = one block of B lanes. The TPU grid runs sequentially,
    so the carry scratch (prefix element of all earlier blocks, replicated
    across lanes) implements the classic block-scan without a second pass."""
    i = pl.program_id(0)

    A = ll.mat_from_ref(A_ref, d, d, B)
    C = ll.mat_from_ref(C_ref, d, d, B)
    J = ll.mat_from_ref(J_ref, d, d, B)
    b = b_ref[:]
    e = e_ref[:]

    # Block-local Hillis–Steele inclusive scan.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
    s = 1
    for _ in range(levels):
        left = (
            _roll_mat(A, s), pltpu.roll(b, s, axis=1), _roll_mat(C, s),
            pltpu.roll(e, s, axis=1), _roll_mat(J, s),
        )
        nA, nb, nC, ne, nJ = _combine(left, (A, b, C, e, J), d, B)
        m = lane >= s
        A = [jnp.where(m, nA[k], A[k]) for k in range(d)]
        b = jnp.where(m, nb, b)
        C = [jnp.where(m, nC[k], C[k]) for k in range(d)]
        e = jnp.where(m, ne, e)
        J = [jnp.where(m, nJ[k], J[k]) for k in range(d)]
        s *= 2

    # Initialise the carry to the identity element on the first block.
    @pl.when(i == 0)
    def _():
        ident = ll.mat_eye(d, B, b.dtype)
        zero = jnp.zeros_like(b)
        ll.mat_to_ref(cA_ref, ident, d, B)
        cb_ref[:] = zero
        ll.mat_to_ref(cC_ref, [jnp.zeros_like(r) for r in ident], d, B)
        ce_ref[:] = zero
        ll.mat_to_ref(cJ_ref, [jnp.zeros_like(r) for r in ident], d, B)

    carry = (
        ll.mat_from_ref(cA_ref, d, d, B), cb_ref[:], ll.mat_from_ref(cC_ref, d, d, B),
        ce_ref[:], ll.mat_from_ref(cJ_ref, d, d, B),
    )
    A, b, C, e, J = _combine(carry, (A, b, C, e, J), d, B)

    ll.mat_to_ref(oA_ref, A, d, B)
    ob_ref[:] = b
    ll.mat_to_ref(oC_ref, C, d, B)
    oe_ref[:] = e
    ll.mat_to_ref(oJ_ref, J, d, B)

    # New carry = the combined element at the last lane, lane-replicated.
    ll.mat_to_ref(cA_ref, [_replicate_last_lane(r, B) for r in A], d, B)
    cb_ref[:] = _replicate_last_lane(b, B)
    ll.mat_to_ref(cC_ref, [_replicate_last_lane(r, B) for r in C], d, B)
    ce_ref[:] = _replicate_last_lane(e, B)
    ll.mat_to_ref(cJ_ref, [_replicate_last_lane(r, B) for r in J], d, B)


def _chunked_scan_kernel(A_ref, b_ref, C_ref, e_ref, J_ref,
                         oA_ref, ob_ref, oC_ref, oe_ref, oJ_ref,
                         cA_ref, cb_ref, cC_ref, ce_ref, cJ_ref,
                         *, d, S, L):
    """Work-efficient two-level scan: one grid step = S*L consecutive
    elements laid out chunk-major (lane c of position ref [s] holds element
    t = block*S*L + c*S + s).

    Hillis-Steele over B lanes costs B*log2(B) lane-combines; this kernel
    does (S-1)*L (within-chunk sequential prefixes, pass 1) + L*log2(L)
    (chunk-total scan, pass 2) + (S+1)*L (carry + apply, pass 3)
    = (2S + log2(L)) * L — ~3.1x fewer at S=8, L=128 than the 9-level
    Hillis-Steele block scan at the headline T=1024 shape, at the same
    per-combine algebra (`_combine`). Association differs (chunked vs
    strided), so results agree with the XLA scan to f32 rounding, not
    bitwise — covered by the same accuracy band as the HS kernel."""
    i = pl.program_id(0)

    def _mat_at(ref, s):
        X = ref[s]                                    # (d, d, L)
        return [_slice(X, k, k + 1, axis=0).reshape(d, L) for k in range(d)]

    def _mat_set(ref, s, rows):
        ref[s] = jnp.concatenate([r.reshape(1, d, L) for r in rows], axis=0)

    def load(s):
        return (_mat_at(A_ref, s), b_ref[s], _mat_at(C_ref, s), e_ref[s],
                _mat_at(J_ref, s))

    def store(s, el):
        A, b, C, e, J = el
        _mat_set(oA_ref, s, A)
        ob_ref[s] = b
        _mat_set(oC_ref, s, C)
        oe_ref[s] = e
        _mat_set(oJ_ref, s, J)

    # Pass 1: within-chunk inclusive prefixes, parked in the out refs.
    prefix = load(0)
    store(0, prefix)
    for s in range(1, S):
        prefix = _combine(prefix, load(s), d, L)
        store(s, prefix)

    # Pass 2: Hillis-Steele inclusive scan over the L chunk totals.
    A, b, C, e, J = prefix
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    s_sh = 1
    while s_sh < L:
        left = (_roll_mat(A, s_sh), pltpu.roll(b, s_sh, axis=1),
                _roll_mat(C, s_sh), pltpu.roll(e, s_sh, axis=1),
                _roll_mat(J, s_sh))
        nA, nb, nC, ne, nJ = _combine(left, (A, b, C, e, J), d, L)
        m = lane >= s_sh
        A = [jnp.where(m, nA[k], A[k]) for k in range(d)]
        b = jnp.where(m, nb, b)
        C = [jnp.where(m, nC[k], C[k]) for k in range(d)]
        e = jnp.where(m, ne, e)
        J = [jnp.where(m, nJ[k], J[k]) for k in range(d)]
        s_sh *= 2

    # Exclusive chunk prefix: lane c <- inclusive total of chunks < c.
    is0 = lane == 0
    eyeL = ll.mat_eye(d, L, b.dtype)
    exA = [jnp.where(is0, eyeL[k], pltpu.roll(A[k], 1, axis=1))
           for k in range(d)]
    exb = jnp.where(is0, jnp.zeros_like(b), pltpu.roll(b, 1, axis=1))
    exC = [jnp.where(is0, jnp.zeros_like(C[k]), pltpu.roll(C[k], 1, axis=1))
           for k in range(d)]
    exe = jnp.where(is0, jnp.zeros_like(e), pltpu.roll(e, 1, axis=1))
    exJ = [jnp.where(is0, jnp.zeros_like(J[k]), pltpu.roll(J[k], 1, axis=1))
           for k in range(d)]

    # Initialise the cross-block carry to the identity on the first block.
    @pl.when(i == 0)
    def _():
        ll.mat_to_ref(cA_ref, eyeL, d, L)
        cb_ref[:] = jnp.zeros_like(b)
        ll.mat_to_ref(cC_ref, [jnp.zeros_like(r) for r in eyeL], d, L)
        ce_ref[:] = jnp.zeros_like(e)
        ll.mat_to_ref(cJ_ref, [jnp.zeros_like(r) for r in eyeL], d, L)

    carry = (ll.mat_from_ref(cA_ref, d, d, L), cb_ref[:],
             ll.mat_from_ref(cC_ref, d, d, L), ce_ref[:],
             ll.mat_from_ref(cJ_ref, d, d, L))
    pre = _combine(carry, (exA, exb, exC, exe, exJ), d, L)

    # Pass 3: out[s] = pre o within-chunk-prefix[s].
    for s in range(S):
        cur = (_mat_at(oA_ref, s), ob_ref[s], _mat_at(oC_ref, s), oe_ref[s],
               _mat_at(oJ_ref, s))
        store(s, _combine(pre, cur, d, L))

    # New carry = last chunk's full prefix, lane-replicated.
    A, b, C, e, J = (_mat_at(oA_ref, S - 1), ob_ref[S - 1],
                     _mat_at(oC_ref, S - 1), oe_ref[S - 1],
                     _mat_at(oJ_ref, S - 1))
    ll.mat_to_ref(cA_ref, [_replicate_last_lane(r, L) for r in A], d, L)
    cb_ref[:] = _replicate_last_lane(b, L)
    ll.mat_to_ref(cC_ref, [_replicate_last_lane(r, L) for r in C], d, L)
    ce_ref[:] = _replicate_last_lane(e, L)
    ll.mat_to_ref(cJ_ref, [_replicate_last_lane(r, L) for r in J], d, L)


def _to_lane_major(z):
    """(T, ...) -> (..., T)."""
    return jnp.moveaxis(z, 0, -1)


def _from_lane_major(z):
    return jnp.moveaxis(z, -1, 0)


_L = 128          # chunk lanes of the work-efficient kernel


def _chunk_positions(T, d):
    """Positions-per-chunk S for `_chunked_scan_kernel`: grow while the
    in+out block VMEM footprint stays within ~8 MB and the block is not
    longer than T."""
    per_elem = (3 * d * d + 2 * d) * 4
    s_max = max(1, (8 << 20) // (2 * per_elem * _L))
    S = 1
    while S < 8 and 2 * S <= s_max and S * _L < T:
        S *= 2
    return S


def _scan_mode():
    return os.environ.get("AUX_SSM_FILTER_SCAN", "auto")


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_filter_scan(elems, interpret=False):
    """Inclusive associative scan of filtering elements in one Pallas launch.

    `elems = (A, b, C, eta, J)` with shapes (T, d, d) / (T, d); returns the
    prefix-combined elements with identical shapes. Equivalent to
    `jax.lax.associative_scan(filtering_operator, elems)` up to f32
    association.

    Two kernels: the work-efficient chunked scan (default at T >= 512,
    ~3x fewer lane-combines) and the original block Hillis-Steele
    (`AUX_SSM_FILTER_SCAN=hs` forces it; `chunked` forces the other).
    """
    A, b, C, e, J = elems
    T, d = b.shape[0], b.shape[1]
    mode = _scan_mode()
    if mode != "hs" and (mode == "chunked" or T >= 512):
        return _fused_filter_scan_chunked(elems, interpret)

    # Pad T to a multiple of the (power-of-two) block size; the pad uses
    # identity elements (A=I, rest 0 — a right identity of the combine) so
    # rolled-in lanes stay finite even though they are masked out.
    BLOCK = min(256, max(128, 1 << (T - 1).bit_length()))
    Tp = ((T + BLOCK - 1) // BLOCK) * BLOCK
    pad = Tp - T
    if pad:
        eyeA = jnp.broadcast_to(jnp.eye(d, dtype=A.dtype), (pad, d, d))
        A = jnp.concatenate([A, eyeA], 0)
        b = jnp.concatenate([b, jnp.zeros((pad, d), b.dtype)], 0)
        C = jnp.concatenate([C, jnp.zeros((pad, d, d), C.dtype)], 0)
        e = jnp.concatenate([e, jnp.zeros((pad, d), e.dtype)], 0)
        J = jnp.concatenate([J, jnp.zeros((pad, d, d), J.dtype)], 0)

    lane = tuple(_to_lane_major(z) for z in (A, b, C, e, J))
    levels = BLOCK.bit_length() - 1
    n_blocks = Tp // BLOCK

    mat_spec = pl.BlockSpec((d, d, BLOCK), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((d, BLOCK), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    specs = [mat_spec, vec_spec, mat_spec, vec_spec, mat_spec]
    shapes = tuple(jax.ShapeDtypeStruct(z.shape, z.dtype) for z in lane)
    dtype = b.dtype

    out = pl.pallas_call(
        functools.partial(_scan_kernel, d=d, B=BLOCK, levels=levels),
        grid=(n_blocks,),
        out_shape=shapes,
        in_specs=specs,
        out_specs=tuple(specs),
        scratch_shapes=[
            pltpu.VMEM((d, d, BLOCK), dtype), pltpu.VMEM((d, BLOCK), dtype),
            pltpu.VMEM((d, d, BLOCK), dtype), pltpu.VMEM((d, BLOCK), dtype),
            pltpu.VMEM((d, d, BLOCK), dtype),
        ],
        # The combine holds ~a dozen (d, d, BLOCK) live temporaries (two
        # solves + five matmuls per level); at d ~ 30 that passes the
        # default 16 MB scoped-VMEM limit — raise it as csmc_fwd does.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*lane)

    out = tuple(_from_lane_major(z)[:T] for z in out)
    return out


def _fused_filter_scan_chunked(elems, interpret=False):
    """Work-efficient two-level scan entry: chunk-major layout
    (position s, lane = block * L + chunk) feeding `_chunked_scan_kernel`."""
    A, b, C, e, J = elems
    T, d = b.shape[0], b.shape[1]
    S = _chunk_positions(T, d)
    BLOCK = S * _L
    Tp = -(-T // BLOCK) * BLOCK
    pad = Tp - T
    if pad:
        eyeA = jnp.broadcast_to(jnp.eye(d, dtype=A.dtype), (pad, d, d))
        A = jnp.concatenate([A, eyeA], 0)
        b = jnp.concatenate([b, jnp.zeros((pad, d), b.dtype)], 0)
        C = jnp.concatenate([C, jnp.zeros((pad, d, d), C.dtype)], 0)
        e = jnp.concatenate([e, jnp.zeros((pad, d), e.dtype)], 0)
        J = jnp.concatenate([J, jnp.zeros((pad, d, d), J.dtype)], 0)
    n_blocks = Tp // BLOCK

    def to_chunk(z):
        # (Tp, ...) -> (S, ..., n_blocks * L); t = blk*BLOCK + c*S + s.
        zz = z.reshape((n_blocks, _L, S) + z.shape[1:])
        zz = jnp.moveaxis(zz, (0, 1, 2), (-2, -1, 0))
        return zz.reshape((S,) + z.shape[1:] + (n_blocks * _L,))

    def from_chunk(z):
        zz = z.reshape((S,) + z.shape[1:-1] + (n_blocks, _L))
        zz = jnp.moveaxis(zz, (0, -2, -1), (2, 0, 1))
        return zz.reshape((Tp,) + z.shape[1:-1])[:T]

    chunked = tuple(to_chunk(z) for z in (A, b, C, e, J))
    mat_spec = pl.BlockSpec((S, d, d, _L), lambda i: (0, 0, 0, i),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((S, d, _L), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)
    specs = [mat_spec, vec_spec, mat_spec, vec_spec, mat_spec]
    shapes = tuple(jax.ShapeDtypeStruct(z.shape, z.dtype) for z in chunked)
    dtype = b.dtype

    out = pl.pallas_call(
        functools.partial(_chunked_scan_kernel, d=d, S=S, L=_L),
        grid=(n_blocks,),
        out_shape=shapes,
        in_specs=specs,
        out_specs=tuple(specs),
        scratch_shapes=[
            pltpu.VMEM((d, d, _L), dtype), pltpu.VMEM((d, _L), dtype),
            pltpu.VMEM((d, d, _L), dtype), pltpu.VMEM((d, _L), dtype),
            pltpu.VMEM((d, d, _L), dtype),
        ],
        # Same raised scoped-VMEM ceiling as the HS kernel (large d).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*chunked)

    return tuple(from_chunk(z) for z in out)


def vmem_estimate_bytes(T, d, dtype_bytes=4):
    """Rough VMEM need per grid step (block-chunked: independent of T)."""
    block = min(256, max(128, 1 << (max(T, 2) - 1).bit_length()))
    per_set = (3 * d * d + 2 * d) * block * dtype_bytes
    return 5 * per_set  # in + out + carry + ~2 sets of live temporaries
