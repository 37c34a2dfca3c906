#!/usr/bin/env bash
# Rare-event experiment schedule — the grid of reference
# `examples/rare_event/experiment.sh` (kalman + csmc{,-guided} x gradient,
# batch of 8 chains, double precision, alpha 0.5). Each invocation runs the
# full 10x10 (rho, r2) grid x 8 chains in ONE program (grid-vmapped) and
# writes a per-cell CSV; `--figures-dir` adds the ESS / moment-error
# heatmaps of the reference's results analysis.
set -euo pipefail
OUT=${1:-results/rare_event}
mkdir -p "$OUT"
common=(--T 2 --y 5.0 --grid-size 10 --n-chains 8 --precision double
        --target-alpha 0.5 --n-samples 10000 --burnin 2500 --seed 42)
for grad in --no-gradient --gradient; do
  python -m aux_ssm_tpu.experiments.rare_event "${common[@]}" --style kalman-1 \
    "$grad" --out "$OUT/kalman${grad/--/_}.csv" \
    --figures-dir "$OUT/figs_kalman${grad/--/_}"
  python -m aux_ssm_tpu.experiments.rare_event "${common[@]}" --style csmc \
    --N 25 "$grad" --out "$OUT/csmc${grad/--/_}.csv" \
    --figures-dir "$OUT/figs_csmc${grad/--/_}"
  python -m aux_ssm_tpu.experiments.rare_event "${common[@]}" \
    --style csmc-guided --N 25 "$grad" \
    --out "$OUT/csmc_guided${grad/--/_}.csv" \
    --figures-dir "$OUT/figs_csmc_guided${grad/--/_}"
done
