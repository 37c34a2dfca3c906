"""Shared CLI plumbing for the experiment drivers — one structured flag set
replacing the reference's per-script argparse duplication
(`examples/*/experiment.py:16-57`)."""
import argparse

from ..config import BackendConfig
from .runner import RunConfig


def base_parser(description):
    p = argparse.ArgumentParser(description)
    p.add_argument("--style", type=str, default="kalman-1",
                   help="kalman-1 | kalman-2 | csmc | csmc-guided")
    p.add_argument("--parallel", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--gradient", action=argparse.BooleanOptionalAction, default=False)
    p.add_argument("--backward", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--N", dest="n_particles", type=int, default=25)
    p.add_argument("--resampling", type=str, default="multinomial")

    p.add_argument("--n-samples", type=int, default=10_000)
    p.add_argument("--burnin", type=int, default=2_500)
    p.add_argument("--target-alpha", type=float, default=0.5)
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--beta", type=float, default=0.05)
    p.add_argument("--delta-init", type=float, default=1e-2)
    p.add_argument("--seed", type=int, default=42)

    p.add_argument("--precision", type=str, default="single")
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--debug-nans", action="store_true")
    p.add_argument("--verbose", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--out", type=str, default=None, help="output .npz path")
    p.add_argument("--checkpoint-dir", type=str, default=None,
                   help="persist/resume chain state under this directory")
    p.add_argument("--checkpoint-every", type=int, default=0,
                   help="checkpoint period in iterations (0 = phase ends only)")
    p.add_argument("--n-chains", type=int, default=1,
                   help="independent chains, sharded over the mesh 'chains' axis")
    p.add_argument("--mesh-chains", type=int, default=0,
                   help="devices on the 'chains' mesh axis (0 = no mesh)")
    return p


def experiment_config(args, **overrides):
    """Build the typed `ExperimentConfig` from parsed CLI args — the single
    source of truth the drivers consume (config.py and this module are two
    views of the same axes)."""
    from ..config import ExperimentConfig, BackendConfig, SamplerConfig
    from ..config import MeshConfig
    mesh_n = getattr(args, "mesh_chains", 0)
    kw = dict(
        backend=BackendConfig(precision=args.precision, platform=args.platform,
                              debug=args.debug, debug_nans=args.debug_nans),
        mesh=MeshConfig(axis_names=("chains",),
                        axis_sizes=(mesh_n,) if mesh_n else None),
        sampler=SamplerConfig(style=args.style, parallel=args.parallel,
                              gradient=args.gradient, backward=args.backward,
                              n_particles=args.n_particles,
                              resampling=args.resampling),
        run=run_config(args),
        seed=args.seed,
        n_chains=getattr(args, "n_chains", 1),
        checkpoint_dir=getattr(args, "checkpoint_dir", None),
        checkpoint_every=getattr(args, "checkpoint_every", 0),
    )
    kw.update(overrides)
    return ExperimentConfig(**kw)


def apply_backend(args):
    BackendConfig(
        precision=args.precision, platform=args.platform,
        debug=args.debug, debug_nans=args.debug_nans,
    ).apply()


def run_config(args, **overrides):
    kw = dict(
        n_samples=args.n_samples, burnin=args.burnin,
        target_alpha=args.target_alpha, delta_init=args.delta_init,
        learning_rate=args.lr, beta=args.beta, verbose=args.verbose,
    )
    kw.update(overrides)
    return RunConfig(**kw)


def run_maybe_sharded(run_key, kernel, state, cfg, args, *,
                      collect_samples=False, delta_init=None,
                      collect_fn=None):
    """Single- or multi-chain dispatch shared by the experiment drivers.

    `--n-chains 1` (default): plain `run_chain`, `diag` is None.
    `--n-chains K > 1`: the initial state and delta are broadcast to a
    leading chain axis and run through `parallel.chains.run_sharded_chains`
    — one program, per-chain fold_in keys, optionally sharded over a
    `--mesh-chains` device mesh (the reference pattern being scaled up:
    `examples/rare_event/experiment.py:189-196`). Returns (res, diag) where
    `diag` carries cross-chain aggregated stats and a split-R-hat summary:
    rank-normalized split-R-hat over sample coordinates when samples were
    collected, else the moment-based classical R-hat from the online stats.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from .runner import run_chain

    n_chains = getattr(args, "n_chains", 1)
    ckpt_dir = getattr(args, "checkpoint_dir", None)
    ckpt_every = getattr(args, "checkpoint_every", 0)
    if n_chains <= 1:
        res = run_chain(run_key, kernel, state, cfg,
                        collect_samples=collect_samples, delta_init=delta_init,
                        checkpoint_dir=ckpt_dir, checkpoint_every=ckpt_every,
                        collect_fn=collect_fn)
        return res, None

    from ..parallel.chains import run_sharded_chains, aggregate_chain_stats
    from ..utils.ess import potential_scale_reduction, rhat_from_moments
    from ..utils.stats import variance

    bc = lambda z: jnp.broadcast_to(jnp.asarray(z),
                                    (n_chains,) + jnp.shape(jnp.asarray(z)))
    states = jax.tree.map(bc, state)
    delta0 = bc(cfg.delta_init if delta_init is None else delta_init)

    mesh_n = getattr(args, "mesh_chains", 0)
    mesh = None
    if mesh_n:
        if n_chains % mesh_n:
            raise ValueError(f"--mesh-chains {mesh_n} does not divide "
                             f"--n-chains {n_chains}")
        from ..parallel.mesh import make_mesh, CHAINS
        mesh = make_mesh(devices=jax.devices()[:mesh_n], axis_names=(CHAINS,))

    res = run_sharded_chains(run_key, kernel, states, cfg, mesh=mesh,
                             collect_samples=collect_samples,
                             delta_init=delta0, checkpoint_dir=ckpt_dir,
                             checkpoint_every=ckpt_every,
                             collect_fn=collect_fn)
    agg = aggregate_chain_stats(res.stats)

    if collect_samples and res.samples is not None and res.samples.size:
        # (n_chains, n, *coords) -> split-R-hat per coordinate on a spread of
        # up to 128 coordinates (full rank-normalization on every coordinate
        # of a long trajectory is post-processing overkill).
        s = np.asarray(res.samples)
        flat = s.reshape(s.shape[0], s.shape[1], -1)
        n_coords = flat.shape[-1]
        take = np.unique(np.linspace(0, n_coords - 1,
                                     min(128, n_coords)).astype(int))
        rhats = jax.vmap(potential_scale_reduction, in_axes=2)(
            jnp.asarray(flat[:, :, take]))
    else:
        rhats = rhat_from_moments(res.stats.mean_x, variance(res.stats),
                                  cfg.n_samples).ravel()
    diag = dict(stats=agg, rhat_max=float(jnp.max(rhats)),
                rhat_median=float(jnp.median(rhats)), n_chains=n_chains)
    return res, diag


def chain_summary(res, diag, cfg):
    """One-line throughput/health suffix shared by the drivers: total
    samples/s across chains plus the split-R-hat summary for sharded runs."""
    if diag is None:
        return ""
    total = diag["n_chains"] * cfg.n_samples
    return (f", {diag['n_chains']} chains ({total / res.sampling_time:.1f} "
            f"samples/s total), Rhat max={diag['rhat_max']:.3f} "
            f"median={diag['rhat_median']:.3f}")


def save_results(path, **arrays):
    if path:
        import numpy as np
        np.savez(path, **{k: np.asarray(v) for k, v in arrays.items()})
        print(f"saved results to {path}")
