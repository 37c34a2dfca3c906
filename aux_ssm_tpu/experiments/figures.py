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

    p_re = sub.add_parser("rare-event")
    p_re.add_argument("--summary", required=True, help="run_grid CSV output")
    p_re.add_argument("--out-dir", default="results")

    args = p.parse_args(argv)
    if args.cmd == "sv":
        results = {}
        for spec in args.run:
            style, path = spec.split("=", 1)
            data = np.load(path)
            results[style] = dict(ejsd=data["ejsd"],
                                  sampling_time=float(data["sampling_time"]))
        sv_style_comparison(results, args.n_samples, args.out_dir)
        print(f"wrote ESJD.csv / ESJD_time.csv / sv_ejsd.png to {args.out_dir}")
    else:
        import pandas as pd
        rows = pd.read_csv(args.summary).to_dict("records")
        rare_event_heatmaps(rows, args.out_dir)
        print(f"wrote rare_event_summary.csv / rare_event_heatmaps.png "
              f"to {args.out_dir}")


if __name__ == "__main__":
    main()
