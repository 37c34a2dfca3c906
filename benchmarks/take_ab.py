"""A/B micro-bench for scalar-valued batched row selection
out[r, j] = vals[r, idx[r, j]] at PIT genealogy shapes — the width-1 payload
case where a one-hot MXU select runs at 1/128 lane utilisation.

Variants:
  onehot      current take_rows lowering (one-hot select, C=1)
  onehotT     transposed contraction (vals as M=1 row, output width n)
  tile_gather tile gather + one-hot lane reduce

    python benchmarks/take_ab.py [rows] [N]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(rows, N):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from aux_ssm_tpu.ops.take import take_rows, _TILE
    from aux_ssm_tpu.utils.profiling import timeit_ms

    key = jax.random.key(0)
    vals = jax.random.normal(jax.random.fold_in(key, 0), (rows, N))
    idx = jax.random.randint(jax.random.fold_in(key, 1), (rows, N), 0, N,
                             dtype=jnp.int32)

    def onehot(v, i):
        return take_rows(v, i)

    def onehotT(v, i):
        # out[r, j] = sum_i v[r, i] oh[r, i, j]; output width n fills lanes.
        ohT = (i[:, None, :] == jax.lax.broadcasted_iota(
            jnp.int32, (rows, N, N), 1)).astype(v.dtype)
        return jax.lax.dot_general(v[:, None, :], ohT,
                                   (((2,), (1,)), ((0,), (0,))))[:, 0]

    def tile_gather(v, i):
        nb = N // _TILE
        tiles = v.reshape(rows, nb, _TILE)
        t = jnp.broadcast_to((i >> 7)[..., None],
                             i.shape + (_TILE,))              # (rows, n, TILE)
        sel = jnp.take_along_axis(tiles, t, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, sel.shape, 2)
        return jnp.sum(jnp.where(lane == (i & (_TILE - 1))[..., None],
                                 sel, 0.0), axis=-1)

    want = np.take_along_axis(np.asarray(vals), np.asarray(idx), axis=1)
    out = {}
    for name, fn in [("onehot", onehot), ("onehotT", onehotT),
                     ("tile_gather", tile_gather)]:
        try:
            got = np.asarray(jax.jit(fn)(vals, idx))
            ok = bool(np.array_equal(got, want))
            ms = timeit_ms(fn, vals, idx)
            out[name] = {"ms": round(ms, 3), "exact": ok}
        except Exception as e:
            out[name] = {"error": f"{type(e).__name__}: {str(e)[:80]}"}
    print(json.dumps({"rows": rows, "N": N, **out}))


if __name__ == "__main__":
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    main(rows, N)
