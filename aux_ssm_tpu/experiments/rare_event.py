"""Rare-event experiment driver (reference `examples/rare_event/
experiment.py` capability): grid over (rho, r2), batched chains, ESS and
moment accuracy vs the closed-form conditionals.

    python -m aux_ssm_tpu.experiments.rare_event --grid-size 5 --style kalman
"""
import jax
import jax.numpy as jnp
import numpy as np

from ..models import rare_event as re_model
from ..utils.ess import effective_sample_size
from . import cli
from .runner import run_chain


def build_kernel(style, args, rho, r2):
    if style.startswith("kalman"):
        return re_model.get_kalman_kernel(args.y, rho, r2, args.T, args.parallel,
                                          gradient=args.gradient), False
    if style == "csmc":
        return re_model.get_csmc_kernel(args.y, rho, r2, args.T, args.n_particles,
                                        backward=args.backward, parallel=args.parallel,
                                        gradient=args.gradient), True
    if style == "csmc-guided":
        return re_model.get_guided_csmc_kernel(args.y, rho, r2, args.T,
                                               args.n_particles, backward=args.backward,
                                               gradient=args.gradient), True
    raise ValueError(f"unknown style {style!r}")


def main(argv=None):
    p = cli.base_parser("Rare-event experiment")
    p.add_argument("--T", type=int, default=2)
    p.add_argument("--y", type=float, default=5.0)
    p.add_argument("--grid-size", type=int, default=10)
    args = p.parse_args(argv)
    cli.apply_backend(args)

    rhos = np.linspace(0.0, 0.999, args.grid_size)
    r2s = np.logspace(-3, 0, args.grid_size)

    rows = []
    for rho in rhos:
        for r2 in r2s:
            (init, kernel), is_csmc = build_kernel(args.style, args, float(rho), float(r2))
            key = jax.random.key(args.seed)
            init_key, run_key = jax.random.split(key)
            x0 = re_model.init_x(init_key, args.y, float(rho), float(r2), args.T)
            delta0 = args.delta_init * (jnp.ones(args.T) if is_csmc else 1.0)
            cfg = cli.run_config(args, verbose=False)
            res = run_chain(run_key, kernel, init(x0), cfg, collect_samples=True,
                            delta_init=delta0)
            s = np.asarray(res.samples)

            (m0c, v0c), (mTc, vTc) = re_model.conditional_moments(
                args.y, float(rho), float(r2), args.T)
            x0s, xTs = s[:, 0, 0], s[:, -1, 0]
            rows.append(dict(
                rho=float(rho), r2=float(r2),
                err_mean_0=(x0s.mean() - m0c) ** 2 / v0c,
                err_std_0=(x0s.std() - np.sqrt(v0c)) / np.sqrt(v0c),
                err_mean_T=(xTs.mean() - mTc) ** 2 / vTc,
                err_std_T=(xTs.std() - np.sqrt(vTc)) / np.sqrt(vTc),
                ess_0=float(effective_sample_size(x0s)),
                ess_T=float(effective_sample_size(xTs)),
                acc=float(jnp.mean(res.stats.accept_cum)),
                time=res.sampling_time,
            ))
            r = rows[-1]
            print(f"rho={r['rho']:.2f} r2={r['r2']:.3g}: acc={r['acc']:.2f} "
                  f"ESS_T={r['ess_T']:.0f} errT={r['err_mean_T']:.3g} "
                  f"t={r['time']:.1f}s", flush=True)

    if args.out:
        import pandas as pd
        pd.DataFrame(rows).to_csv(args.out, index=False)
        print(f"saved grid results to {args.out}")
    return rows


if __name__ == "__main__":
    main()
