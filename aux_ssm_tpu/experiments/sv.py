"""Stochastic-volatility experiment driver (reference
`examples/stochastic_volatility/experiment.py` capability; default config
T=250, D=30, N=25, 10k/2.5k, target alpha 0.5).

    python -m aux_ssm_tpu.experiments.sv --style kalman-2 --T 250 --D 30
    python -m aux_ssm_tpu.experiments.sv --n-chains 8 --mesh-chains 8
"""
import jax
import jax.numpy as jnp
import numpy as np

from ..models import stochastic_volatility as sv
from ..utils.analysis import ejsd_per_time, ess_summary
from . import cli

NU, PHI, TAU, RHO = 0.0, 0.9, 2.0, 0.25


def build_kernel(style, ys, args):
    if style in ("kalman-1", "kalman-2"):
        order = 1 if style == "kalman-1" else 2
        return sv.get_kalman_kernel(ys, NU, PHI, TAU, RHO, args.parallel, order=order)
    if style == "csmc":
        return sv.get_csmc_kernel(ys, NU, PHI, TAU, RHO, args.n_particles,
                                  backward=args.backward, parallel=args.parallel,
                                  gradient=args.gradient, resampling=args.resampling)
    if style == "csmc-guided":
        return sv.get_guided_csmc_kernel(ys, NU, PHI, TAU, RHO, args.n_particles,
                                         backward=args.backward, gradient=args.gradient,
                                         resampling=args.resampling)
    raise ValueError(f"unknown style {style!r}")


def main(argv=None):
    p = cli.base_parser("Stochastic-volatility experiment")
    p.add_argument("--T", type=int, default=250)
    p.add_argument("--D", type=int, default=30)
    args = p.parse_args(argv)
    cfg_x = cli.experiment_config(args)
    cfg_x.backend.apply()

    key = jax.random.key(args.seed)
    data_key, init_key, run_key = jax.random.split(key, 3)
    xs_true, ys = sv.get_data(data_key, NU, PHI, TAU, RHO, args.D, args.T)
    x0 = sv.init_x_fn(init_key, ys, NU, PHI, TAU, RHO, max(args.n_particles, 32))

    init, kernel = build_kernel(args.style, ys, args)
    state = init(x0)

    is_csmc = args.style.startswith("csmc")
    delta0 = args.delta_init * (jnp.ones(args.T) if is_csmc else 1.0)
    cfg = cfg_x.run
    res, diag = cli.run_maybe_sharded(run_key, kernel, state, cfg, args,
                                      collect_samples=True, delta_init=delta0)
    samples = np.asarray(res.samples)
    stats = diag["stats"] if diag else res.stats
    # Multi-chain: ess_summary's coordinates pool (n_chains, n) stacks.
    pooled = samples.reshape(-1, *samples.shape[-2:]) if diag else samples

    ess = ess_summary(pooled)
    efficiency = ejsd_per_time(jnp.mean(stats.ejsd), res.sampling_time,
                               cfg.n_samples)
    print(f"style={args.style} T={args.T} D={args.D}: "
          f"time={res.sampling_time:.2f}s "
          f"({cfg.n_samples / res.sampling_time:.1f} samples/s), "
          f"acc={float(jnp.mean(stats.accept_cum)):.3f}, "
          f"mean EJSD={float(jnp.mean(stats.ejsd)):.4g}, "
          f"EJSD/time-per-iter={float(efficiency):.4g}, "
          f"ESS(quartiles)={[round(v, 1) for v in ess.values()]}"
          f"{cli.chain_summary(res, diag, cfg)}")

    cli.save_results(args.out, samples_mean=pooled.mean(0),
                     samples_std=pooled.std(0),
                     ejsd=stats.ejsd, delta=res.delta, xs_true=xs_true,
                     ys=ys, sampling_time=res.sampling_time)
    return res


if __name__ == "__main__":
    main()
