#!/usr/bin/env bash
# Reproduction schedule for the Lorenz parameter-learning experiment on the
# shipped Mider et al. dataset — reference `examples/lorenz/experiment.sh`
# (freq in {1,2,4,8}) with the reference hyper-parameters
# (`examples/lorenz/experiment.py:38-57`): 100k samples, 2.5k burn-in,
# target acceptance 0.234, lr 1.0, delta_init 1e-5. Results land in the
# standard .npz schema shared by all drivers (mean_x, ejsd, theta, delta,
# sampling_time).
set -euo pipefail
OUT=${1:-results/lorenz}
mkdir -p "$OUT"
for FREQ in 1 2 4 8; do
  python -m aux_ssm_tpu.experiments.lorenz \
    --data mider --freq "$FREQ" --parallel \
    --n-samples 100000 --burnin 2500 \
    --target-alpha 0.234 --lr 1.0 --delta-init 1e-5 \
    --seed 123 --out "$OUT/mider_freq${FREQ}.npz"
done
