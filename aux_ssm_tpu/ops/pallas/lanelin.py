"""Lane-major small-matrix linear algebra for Pallas TPU kernels.

Representation: a (p, q) matrix batched over T lanes is a Python list of p
arrays of shape (q, T) (row i; first axis = column index). All algebra
reduces to 2-D ops with only (1, T) x (q, T) single-side broadcasts — the
dual-broadcast 3-D form miscompiles on current Mosaic, and value
scatters/gathers are unsupported. Dimensions are static and small, so the
unrolled loops trace a few thousand cheap VPU ops.
"""
import jax
import jax.numpy as jnp

_slice = jax.lax.slice_in_dim


def ent(row, k):
    """Entry k of a matrix row: (1, T) slice of a (q, T) array."""
    return _slice(row, k, k + 1, axis=0)


def mat_transpose(X):
    """Row-list transpose of a (p, q) matrix -> (q, p)."""
    p, q = len(X), X[0].shape[0]
    return [jnp.concatenate([ent(X[k], i) for k in range(p)], axis=0)
            for i in range(q)]


def mat_mul(X, Y):
    """(p, q) @ (q, r): out[i] = sum_k X[i][k] * Y[k]."""
    q = len(Y)
    out = []
    for i in range(len(X)):
        acc = ent(X[i], 0) * Y[0]
        for k in range(1, q):
            acc = acc + ent(X[i], k) * Y[k]
        out.append(acc)
    return out


def mat_vec(X, v):
    """(p, q) @ (q,): v is (q, T); returns (p, T)."""
    q = v.shape[0]
    rows = []
    for i in range(len(X)):
        acc = ent(X[i], 0) * ent(v, 0)
        for k in range(1, q):
            acc = acc + ent(X[i], k) * ent(v, k)
        rows.append(acc)
    return jnp.concatenate(rows, axis=0)


def mat_add(X, Y):
    return [x + y for x, y in zip(X, Y)]


def mat_sub(X, Y):
    return [x - y for x, y in zip(X, Y)]


def mat_sym(X):
    XT = mat_transpose(X)
    return [0.5 * (x + xt) for x, xt in zip(X, XT)]


def mat_eye(d, T, dtype):
    lane = jax.lax.broadcasted_iota(jnp.int32, (d, T), 0)
    return [jnp.where(lane == i, jnp.ones((), dtype), jnp.zeros((), dtype))
            for i in range(d)]


def mat_from_ref(ref, p, q, T):
    """Load a (p, q, T) VMEM ref block into a row list."""
    X = ref[:]
    return [_slice(X, i, i + 1, axis=0).reshape(q, T) for i in range(p)]


def mat_to_ref(ref, rows, q, T):
    ref[:] = jnp.concatenate([r.reshape(1, q, T) for r in rows], axis=0)


def gj_inv(M, d, T):
    """Gauss–Jordan inverse without pivoting (lane-batched). Row writes are
    plain Python list assignment — zero data movement."""
    M = list(M)
    Z = mat_eye(d, T, M[0].dtype)
    for k in range(d):
        inv_p = 1.0 / ent(M[k], k)
        Mk = M[k] * inv_p
        Zk = Z[k] * inv_p
        for i in range(d):
            if i == k:
                continue
            f = ent(M[i], k)
            M[i] = M[i] - f * Mk
            Z[i] = Z[i] - f * Zk
        M[k] = Mk
        Z[k] = Zk
    return Z


def chol(M, d, T):
    """Cholesky (lower) of an SPD (d, d) row-list matrix, lane-batched.
    Returns (L_rows, log_det) with log_det = sum(log diag) as (1, T)."""
    ents = [[None] * d for _ in range(d)]
    log_det = None
    for j in range(d):
        acc = ent(M[j], j)
        for k in range(j):
            acc = acc - ents[j][k] * ents[j][k]
        diag = jnp.sqrt(acc)
        inv_diag = 1.0 / diag
        ents[j][j] = diag
        ld = jnp.log(diag)
        log_det = ld if log_det is None else log_det + ld
        for i in range(j + 1, d):
            acc = ent(M[i], j)
            for k in range(j):
                acc = acc - ents[i][k] * ents[j][k]
            ents[i][j] = acc * inv_diag
    zero = jnp.zeros_like(ents[0][0])
    rows = [jnp.concatenate(ents[i][:i + 1] + [zero] * (d - 1 - i), axis=0)
            for i in range(d)]
    return rows, log_det


def tri_solve_lower(L, B, d):
    """Solve L X = B (L lower (d, d) row list; B a (d, r) row list)."""
    X = [None] * d
    for i in range(d):
        acc = B[i]
        for k in range(i):
            acc = acc - ent(L[i], k) * X[k]
        X[i] = acc / ent(L[i], i)
    return X


def tri_solve_lower_T(L, B, d):
    """Solve L^T X = B (back substitution with the lower factor)."""
    X = [None] * d
    for i in range(d - 1, -1, -1):
        acc = B[i]
        for k in range(i + 1, d):
            acc = acc - ent(L[k], i) * X[k]
        X[i] = acc / ent(L[i], i)
    return X


def spd_solve(S, B, d, T):
    """S^{-1} B for SPD S via Cholesky; B a row list. Returns (X, log_det)."""
    L, log_det = chol(S, d, T)
    return tri_solve_lower_T(L, tri_solve_lower(L, B, d), d), log_det


def vec_rows(v, d):
    """(d, T) vector viewed as a (d, 1) row list (each row (1, T))."""
    return [ent(v, i) for i in range(d)]


def rows_vec(rows):
    return jnp.concatenate(rows, axis=0)
