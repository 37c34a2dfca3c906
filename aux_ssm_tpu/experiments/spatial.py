"""Spatio-temporal Student-t experiment driver (reference
`examples/spatial/experiment.py` capability; default T=1024, D=8 grid).

    python -m aux_ssm_tpu.experiments.spatial --style kalman-2 --T 1024 --D 8
"""
import jax
import jax.numpy as jnp
import numpy as np

from ..models import spatial as sp
from ..native.precision import precision_stencil
from ..utils.ess import effective_sample_size
from . import cli

SIGMA_X, TAU, R_Y, NU = 0.3, -0.25, 1.0, 4.0


def build_kernel(style, ys, args):
    common = (ys, SIGMA_X, NU, TAU, R_Y, args.D)
    if style in ("kalman-1", "kalman-2"):
        order = 1 if style == "kalman-1" else 2
        return sp.get_kalman_kernel(*common, parallel=args.parallel, order=order), False
    if style == "csmc":
        return sp.get_csmc_kernel(*common, args.n_particles, backward=args.backward,
                                  parallel=args.parallel, gradient=args.gradient,
                                  resampling=args.resampling), True
    if style == "csmc-guided":
        return sp.get_guided_csmc_kernel(*common, args.n_particles,
                                         backward=args.backward,
                                         gradient=args.gradient,
                                         resampling=args.resampling), True
    raise ValueError(f"unknown style {style!r}")


def main(argv=None):
    p = cli.base_parser("Spatio-temporal Student-t experiment")
    p.add_argument("--T", type=int, default=1024)
    p.add_argument("--D", type=int, default=8, help="grid side; state dim = D^2")
    p.add_argument("--batch-sharded", action="store_true",
                   help="shard the B = D^2 component axis over all devices "
                        "(P5; kalman styles only)")
    args = p.parse_args(argv)
    cli.apply_backend(args)

    rng = np.random.default_rng(args.seed)
    xs_true, ys_np = sp.get_data(rng, SIGMA_X, R_Y, TAU, NU, args.D, args.T)
    ys = jnp.asarray(ys_np)
    stencil = jnp.asarray(precision_stencil(TAU, R_Y))
    x0 = sp.init_x_fn(jax.random.key(args.seed + 1), ys, SIGMA_X, NU, stencil,
                      args.D, max(args.n_particles, 32))

    (init, kernel), is_csmc = build_kernel(args.style, ys, args)
    if args.batch_sharded:
        if is_csmc:
            raise SystemExit("--batch-sharded applies to the kalman styles "
                             "(batched (T, B, 1, 1) layout) only")
        if getattr(args, "n_chains", 1) > 1:
            raise SystemExit("--batch-sharded and --n-chains > 1 shard "
                             "different axes over the same devices; pick one")
        from ..parallel.mesh import make_mesh, BATCH
        from ..parallel.batch import batch_sharded_kernel, shard_time_major
        bmesh = make_mesh(axis_names=(BATCH,))
        kernel = batch_sharded_kernel(kernel, bmesh)
        x0 = shard_time_major(bmesh, x0[..., None] if x0.ndim == 2 else x0)
    state = init(x0)

    delta0 = args.delta_init * (jnp.ones(args.T) if is_csmc else 1.0)
    cfg = cli.run_config(args)
    res, diag = cli.run_maybe_sharded(jax.random.key(args.seed + 2), kernel,
                                      state, cfg, args, collect_samples=False,
                                      delta_init=delta0)
    stats = diag["stats"] if diag else res.stats

    acc = float(jnp.mean(stats.accept_cum))
    print(f"style={args.style} T={args.T} D={args.D} (d={args.D ** 2}): "
          f"time={res.sampling_time:.2f}s "
          f"({cfg.n_samples / res.sampling_time:.1f} samples/s), acc={acc:.3f}, "
          f"mean EJSD={float(jnp.mean(stats.ejsd)):.4g}"
          f"{cli.chain_summary(res, diag, cfg)}")

    cli.save_results(args.out, mean_x=stats.mean_x, var_x=stats.mean_x2
                     - stats.mean_x ** 2, ejsd=stats.ejsd,
                     delta=res.delta, xs_true=xs_true, ys=ys_np,
                     sampling_time=res.sampling_time)
    return res


if __name__ == "__main__":
    main()
