#!/usr/bin/env bash
# Spatio-temporal experiment schedule — the grid of reference
# `examples/spatial/experiment.sh:6-9` (kalman + csmc{,-guided} x gradient
# at D=8, T=1024, N=25; alpha 0.5 kalman / 0.25 csmc as in the uncommented
# reference lines). Writes the shared .npz schema; feed the directory to
# `experiments.figures spatial_style_comparison`.
set -euo pipefail
OUT=${1:-results/spatial}
T=${T:-1024}
D=${D:-8}
mkdir -p "$OUT"
common=(--T "$T" --D "$D" --parallel --delta-init 1e-5 --lr 0.1
        --n-samples 10000 --burnin 2500 --seed 42)
for grad in --no-gradient --gradient; do
  python -m aux_ssm_tpu.experiments.spatial "${common[@]}" --style kalman-1 \
    "$grad" --target-alpha 0.5 --out "$OUT/kalman${grad/--/_}.npz"
  python -m aux_ssm_tpu.experiments.spatial "${common[@]}" --style csmc \
    --N 25 "$grad" --target-alpha 0.25 --out "$OUT/csmc${grad/--/_}.npz"
  python -m aux_ssm_tpu.experiments.spatial "${common[@]}" --style csmc-guided \
    --N 25 "$grad" --target-alpha 0.25 \
    --out "$OUT/csmc_guided${grad/--/_}.npz"
done
