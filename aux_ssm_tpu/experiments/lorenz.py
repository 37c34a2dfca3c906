"""Lorenz-63 parameter-learning experiment driver (reference
`examples/lorenz/experiment.py` capability): Gibbs alternation of the
auxiliary Kalman trajectory kernel with the conjugate theta draw. Uses
synthetic data by default; pass --data to load a (t, y2, y3) CSV.

    python -m aux_ssm_tpu.experiments.lorenz --freq 4 --n-samples 20000
"""
import jax
import jax.numpy as jnp
import numpy as np

from ..models import lorenz
from . import cli
from .runner import run_chain

THETA_TRUE = jnp.array([10.0, 28.0, 8.0 / 3.0])
SIGMA_X, SIG_Y = 3.0, 0.5


def main(argv=None):
    p = cli.base_parser("Stochastic Lorenz parameter learning")
    p.add_argument("--n-steps", type=int, default=512)
    p.add_argument("--freq", type=int, default=4, help="observe every k steps")
    p.add_argument("--dt", type=float, default=0.02)
    p.add_argument("--sigma-theta", type=float, default=100.0)
    p.add_argument("--data", type=str, default=None,
                   help="CSV with columns t, y2, y3 (Mider et al. format)")
    args = p.parse_args(argv)
    cli.apply_backend(args)

    m0 = jnp.array([1.5, -1.5, 25.0])
    P0 = jnp.eye(3)

    if args.data:
        data = np.loadtxt(args.data, delimiter=",", skiprows=1)
    else:
        xs = lorenz.sample_trajectory(jax.random.key(args.seed), m0, P0,
                                      THETA_TRUE, SIGMA_X, args.dt, args.n_steps)
        idx = np.arange(0, args.n_steps, args.freq)
        obs = np.asarray(xs)[idx, 1:] + SIG_Y * np.random.default_rng(
            args.seed).standard_normal((len(idx), 2))
        data = np.column_stack([idx * args.dt, obs])

    ys, Hs, Rs, cs = map(jnp.asarray,
                         lorenz.observations_model(data, SIG_Y, args.n_steps, args.freq))
    x0 = lorenz.init_x_fn(jnp.asarray(data), args.n_steps)

    init, kernel = lorenz.get_gibbs_kernel(ys, Hs, Rs, cs, m0, P0, SIGMA_X,
                                           args.dt, args.sigma_theta, args.parallel)
    state = init(x0, jnp.zeros(3))

    cfg = cli.run_config(args)
    res = run_chain(jax.random.key(args.seed + 1), kernel, state, cfg,
                    collect_samples=False)

    theta = np.asarray(res.state.theta)
    print(f"freq={args.freq}: time={res.sampling_time:.2f}s "
          f"({cfg.n_samples / res.sampling_time:.1f} samples/s), "
          f"acc={float(jnp.mean(res.stats.accept_cum)):.3f}, "
          f"theta_final={np.round(theta, 3)} (true {np.asarray(THETA_TRUE)})")

    cli.save_results(args.out, mean_x=res.stats.mean_x, ejsd=res.stats.ejsd,
                     theta=theta, delta=res.delta, sampling_time=res.sampling_time)
    return res


if __name__ == "__main__":
    main()
