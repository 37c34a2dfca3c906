"""Lorenz-63 parameter-learning experiment driver (reference
`examples/lorenz/experiment.py` capability): Gibbs alternation of the
auxiliary Kalman trajectory kernel with the conjugate theta draw.

Synthetic data by default. `--data mider` runs the shipped Mider et al.
reference dataset with the reference's smoothing-frequency semantics
(`experiment.py:74-92`): smoothing grid dt = freq * 1e-4 over t in [0, 2],
observations every 0.01, reference priors/initialisation
(P0 = diag(400, 20, 20), sig_y = sqrt(5), sigma_theta = sqrt(1000),
theta_0 = (5, 15, 6)). `--data PATH` loads any (t, y2, y3) CSV with the
synthetic-mode grid arguments.

    python -m aux_ssm_tpu.experiments.lorenz --data mider --freq 4
    python -m aux_ssm_tpu.experiments.lorenz --freq 4 --n-samples 20000

See benchmarks/lorenz_mider.sh for the committed freq in {1,2,4,8}
reproduction schedule.
"""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..models import lorenz
from . import cli

THETA_TRUE = jnp.array([10.0, 28.0, 8.0 / 3.0])
SIGMA_X, SIG_Y = 3.0, 0.5
MIDER_DATA = Path(__file__).parent / "data" / "lorenz" / "data.csv"


def main(argv=None):
    p = cli.base_parser("Stochastic Lorenz parameter learning")
    p.add_argument("--n-steps", type=int, default=512)
    p.add_argument("--freq", type=int, default=4,
                   help="synthetic: observe every k steps; mider: smoothing "
                        "dt = freq * 1e-4 (reference semantics)")
    p.add_argument("--dt", type=float, default=0.02)
    p.add_argument("--sigma-theta", type=float, default=None,
                   help="theta prior std (default 100, or sqrt(1000) with "
                        "--data mider)")
    p.add_argument("--data", type=str, default=None,
                   help="'mider' for the shipped reference dataset, or a CSV "
                        "path with columns t, y2, y3")
    args = p.parse_args(argv)
    cli.apply_backend(args)

    m0 = jnp.array([1.5, -1.5, 25.0])
    P0 = jnp.eye(3)
    sig_y = SIG_Y
    theta0 = jnp.zeros(3)
    sigma_theta = 100.0 if args.sigma_theta is None else args.sigma_theta
    n_steps, dt, obs_idx = args.n_steps, args.dt, None

    if args.data == "mider":
        data = np.loadtxt(MIDER_DATA, delimiter=",", skiprows=1)
        dt = args.freq * 1e-4
        n_steps = int(round(float(data[-1, 0]) / dt)) + 1
        # Observation times mapped to nearest grid steps (exact for freq
        # dividing 100; at freq=8 the reference's int-truncated [::12] grid
        # misaligns — nearest-step rounding keeps every observation).
        obs_idx = np.rint(data[:, 0] / dt).astype(np.int64)
        P0 = jnp.diag(jnp.array([400.0, 20.0, 20.0]))
        sig_y = 5.0 ** 0.5
        theta0 = jnp.array([5.0, 15.0, 6.0])
        if args.sigma_theta is None:
            sigma_theta = 1e3 ** 0.5
    elif args.data:
        data = np.loadtxt(args.data, delimiter=",", skiprows=1)
        obs_idx = np.rint(data[:, 0] / dt).astype(np.int64)
    else:
        xs = lorenz.sample_trajectory(jax.random.key(args.seed), m0, P0,
                                      THETA_TRUE, SIGMA_X, dt, n_steps)
        idx = np.arange(0, n_steps, args.freq)
        obs = np.asarray(xs)[idx, 1:] + SIG_Y * np.random.default_rng(
            args.seed).standard_normal((len(idx), 2))
        data = np.column_stack([idx * dt, obs])
        obs_idx = idx

    ys, Hs, Rs, cs = map(jnp.asarray,
                         lorenz.observations_model(data, sig_y, n_steps,
                                                   obs_idx=obs_idx))
    x0 = lorenz.init_x_fn(jnp.asarray(data), n_steps)

    init, kernel = lorenz.get_gibbs_kernel(ys, Hs, Rs, cs, m0, P0, SIGMA_X,
                                           dt, sigma_theta, args.parallel)
    state = init(x0, theta0)

    cfg = cli.run_config(args)
    # The theta trace is tiny (n_samples x 3); always collect it so the
    # freq-comparison analysis (reference `examples/lorenz/experiment.py:
    # 272-284` saves theta_samples) works from any run's .npz.
    res, diag = cli.run_maybe_sharded(jax.random.key(args.seed + 1), kernel,
                                      state, cfg, args, collect_samples=True,
                                      collect_fn=lambda s: s.theta)
    stats = diag["stats"] if diag else res.stats

    theta = np.asarray(res.state.theta)
    theta_show = theta.mean(0) if diag else theta
    print(f"freq={args.freq} n_steps={n_steps} dt={dt:g}: "
          f"time={res.sampling_time:.2f}s "
          f"({cfg.n_samples / res.sampling_time:.1f} samples/s), "
          f"acc={float(jnp.mean(stats.accept_cum)):.3f}, "
          f"theta_final={np.round(theta_show, 3)} (true {np.asarray(THETA_TRUE)})"
          f"{cli.chain_summary(res, diag, cfg)}")

    cli.save_results(args.out, mean_x=stats.mean_x, ejsd=stats.ejsd,
                     theta=theta, theta_samples=np.asarray(res.samples),
                     delta=res.delta, sampling_time=res.sampling_time,
                     freq=args.freq)
    return res


if __name__ == "__main__":
    main()
