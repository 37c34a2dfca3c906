"""Result-analysis artifacts (capability parity with the reference's
`examples/*/results/*.py` scripts):

- `sv_style_comparison`: per-time-step EJSD and EJSD/time-per-iteration
  across sampler styles -> CSVs + a comparison figure
  (reference `stochastic_volatility/results/results_analysis_cpu.py:62-110`).
- `rare_event_heatmaps`: normalised moment-error and ESS heatmaps over the
  (rho, r^2) grid -> CSVs + log-scale heatmap figure
  (reference `rare_event/results/result_analysis.py:75-105`).

Pure matplotlib + pandas; figures are written as PNG and the underlying
tables as CSV next to them.
"""
import os

import numpy as np


def _ensure_dir(d):
    os.makedirs(d, exist_ok=True)
    return d


def sv_style_comparison(results, n_samples, out_dir):
    """results: {style_name: dict(ejsd=(T, D) array, sampling_time=float)}.

    Writes ESJD.csv, ESJD_time.csv, and sv_ejsd.png; returns the two
    DataFrames (per-time EJSD summed over components, and EJSD divided by
    the per-iteration wall time — the paper's headline efficiency stat).
    """
    import pandas as pd
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _ensure_dir(out_dir)
    ejsd_cols, eff_cols = {}, {}
    for style, res in results.items():
        ejsd = np.asarray(res["ejsd"])
        per_t = ejsd.sum(-1) if ejsd.ndim > 1 else ejsd
        time_per_iter = float(res["sampling_time"]) / n_samples
        ejsd_cols[style] = per_t
        eff_cols[style] = per_t / time_per_iter

    T = len(next(iter(ejsd_cols.values())))
    ejsd_df = pd.DataFrame({"t": np.arange(T), **ejsd_cols})
    eff_df = pd.DataFrame({"t": np.arange(T), **eff_cols})
    ejsd_df.to_csv(os.path.join(out_dir, "ESJD.csv"), index=False)
    eff_df.to_csv(os.path.join(out_dir, "ESJD_time.csv"), index=False)

    fig, axes = plt.subplots(1, 2, figsize=(12, 4), sharex=True)
    for style in ejsd_cols:
        axes[0].plot(ejsd_df["t"], ejsd_df[style], label=style)
        axes[1].plot(eff_df["t"], eff_df[style], label=style)
    axes[0].set(title="EJSD per time step", xlabel="t", ylabel="EJSD")
    axes[1].set(title="EJSD / time-per-iteration", xlabel="t",
                ylabel="EJSD/s", yscale="log")
    axes[1].legend(frameon=False, fontsize=8)
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "sv_ejsd.png"), dpi=150)
    plt.close(fig)
    return ejsd_df, eff_df


def spatial_style_comparison(results, n_samples, out_dir):
    """Spatial per-style EJSD and EJSD/time tables + figure — the same
    analysis as the reference's `examples/spatial/results/
    results_analysis_cpu.py:66-103` (per-time EJSD summed over the B = D^2
    components, divided by per-iteration wall time). Reuses the generic
    machinery with spatial-named outputs."""
    ejsd_df, eff_df = sv_style_comparison(results, n_samples, out_dir)
    for old, new in (("ESJD.csv", "spatial_ESJD.csv"),
                     ("ESJD_time.csv", "spatial_ESJD_time.csv"),
                     ("sv_ejsd.png", "spatial_ejsd.png")):
        os.replace(os.path.join(out_dir, old), os.path.join(out_dir, new))
    return ejsd_df, eff_df


def lorenz_freq_comparison(results, out_dir):
    """Lorenz parameter-learning analysis across observation/smoothing
    frequencies (reference schedule `examples/lorenz/experiment.sh`, freq in
    {1, 2, 4, 8}; artifacts saved by `experiment.py:272-284`).

    results: {freq: dict(theta_samples=(n, 3), ejsd=(T, d) or (T,),
    sampling_time=float)}. Writes lorenz_theta.csv (per-freq posterior
    mean/std of each theta coordinate + throughput/EJSD summary) and
    lorenz_theta.png (posterior histograms overlaid across freqs + theta
    traces)."""
    import pandas as pd
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _ensure_dir(out_dir)
    names = ["theta1", "theta2", "theta3"]
    rows = []
    for freq, res in sorted(results.items()):
        th = np.asarray(res["theta_samples"])
        if th.ndim == 3:                       # (n_chains, n, 3) -> pooled
            th = th.reshape(-1, th.shape[-1])
        ejsd = np.asarray(res["ejsd"])
        t_iter = float(res["sampling_time"]) / max(len(th), 1)
        rows.append({"freq": freq, "n_samples": len(th),
                     "time_per_iter_s": t_iter,
                     "mean_ejsd": float(ejsd.mean()),
                     "ejsd_per_sec": float(ejsd.mean() / t_iter),
                     **{f"{n}_mean": float(th[:, i].mean())
                        for i, n in enumerate(names)},
                     **{f"{n}_std": float(th[:, i].std())
                        for i, n in enumerate(names)}})
    df = pd.DataFrame(rows)
    df.to_csv(os.path.join(out_dir, "lorenz_theta.csv"), index=False)

    fig, axes = plt.subplots(2, 3, figsize=(13, 7))
    for i, name in enumerate(names):
        for freq, res in sorted(results.items()):
            th = np.asarray(res["theta_samples"]).reshape(-1, 3)
            axes[0, i].hist(th[:, i], bins=60, density=True, alpha=0.5,
                            label=f"freq={freq}")
            axes[1, i].plot(th[:, i], lw=0.4, alpha=0.7, label=f"freq={freq}")
        axes[0, i].set(title=f"{name} posterior", xlabel=name)
        axes[1, i].set(title=f"{name} trace", xlabel="iteration")
    axes[0, 0].legend(frameon=False, fontsize=8)
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "lorenz_theta.png"), dpi=150)
    plt.close(fig)
    return df


def rare_event_heatmaps(rows, out_dir, stem="rare_event"):
    """rows: the per-cell dict list produced by `experiments.rare_event
    .run_grid` (keys rho, r2, err_mean_0/T, err_std_0/T, ess_0/T, acc).

    Writes `<stem>_summary.csv` plus a 2x2 log-scale heatmap figure
    (normalised squared mean error and ESS, at t=0 and t=T)."""
    import pandas as pd
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.colors import LogNorm

    _ensure_dir(out_dir)
    df = pd.DataFrame(rows)
    df.to_csv(os.path.join(out_dir, f"{stem}_summary.csv"), index=False)

    panels = [("err_mean_0", "normalised sq. mean error, t=0"),
              ("err_mean_T", "normalised sq. mean error, t=T"),
              ("ess_0", "ESS, t=0"), ("ess_T", "ESS, t=T")]
    fig, axes = plt.subplots(2, 2, figsize=(10, 8))
    for ax, (col, title) in zip(axes.ravel(), panels):
        pivot = df.pivot(index="rho", columns="r2", values=col)
        vals = np.maximum(np.asarray(pivot.values, float), 1e-12)
        im = ax.imshow(vals, origin="lower", aspect="auto", cmap="viridis",
                       norm=LogNorm(),
                       extent=[np.log10(pivot.columns.min()),
                               np.log10(pivot.columns.max()),
                               pivot.index.min(), pivot.index.max()])
        ax.set(title=title, xlabel="log10 r2", ylabel="rho")
        fig.colorbar(im, ax=ax, shrink=0.85)
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, f"{stem}_heatmaps.png"), dpi=150)
    plt.close(fig)
    return df


def main(argv=None):
    """CLI: build the analysis artifacts from saved driver outputs.

        python -m aux_ssm_tpu.experiments.figures sv \
            --run kalman-1=out_k1.npz --run csmc=out_csmc.npz \
            --n-samples 10000 --out-dir results/
        python -m aux_ssm_tpu.experiments.figures rare-event \
            --summary rare_event.csv --out-dir results/
    """
    import argparse
    p = argparse.ArgumentParser(description=main.__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    p_sv = sub.add_parser("sv")
    p_sv.add_argument("--run", action="append", required=True,
                      metavar="STYLE=PATH.npz")
    p_sv.add_argument("--n-samples", type=int, required=True)
    p_sv.add_argument("--out-dir", default="results")

    p_sp = sub.add_parser("spatial")
    p_sp.add_argument("--run", action="append", required=True,
                      metavar="STYLE=PATH.npz")
    p_sp.add_argument("--n-samples", type=int, required=True)
    p_sp.add_argument("--out-dir", default="results")

    p_lz = sub.add_parser("lorenz")
    p_lz.add_argument("--run", action="append", required=True,
                      metavar="FREQ=PATH.npz")
    p_lz.add_argument("--out-dir", default="results")

    p_re = sub.add_parser("rare-event")
    p_re.add_argument("--summary", required=True, help="run_grid CSV output")
    p_re.add_argument("--out-dir", default="results")

    args = p.parse_args(argv)
    if args.cmd in ("sv", "spatial"):
        results = {}
        for spec in args.run:
            style, path = spec.split("=", 1)
            data = np.load(path)
            results[style] = dict(ejsd=data["ejsd"],
                                  sampling_time=float(data["sampling_time"]))
        fn = (sv_style_comparison if args.cmd == "sv"
              else spatial_style_comparison)
        fn(results, args.n_samples, args.out_dir)
        print(f"wrote ESJD / ESJD_time / ejsd figure to {args.out_dir}")
    elif args.cmd == "lorenz":
        results = {}
        for spec in args.run:
            freq, path = spec.split("=", 1)
            data = np.load(path)
            results[int(freq)] = dict(
                theta_samples=data["theta_samples"], ejsd=data["ejsd"],
                sampling_time=float(data["sampling_time"]))
        lorenz_freq_comparison(results, args.out_dir)
        print(f"wrote lorenz_theta.csv / lorenz_theta.png to {args.out_dir}")
    else:
        import pandas as pd
        rows = pd.read_csv(args.summary).to_dict("records")
        rare_event_heatmaps(rows, args.out_dir)
        print(f"wrote rare_event_summary.csv / rare_event_heatmaps.png "
              f"to {args.out_dir}")


if __name__ == "__main__":
    main()
