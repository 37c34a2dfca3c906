#!/usr/bin/env bash
# Round-5 measurement chain: runs every outstanding VERDICT-r4 measurement
# serially on the single TPU, highest-priority first, so partial results
# survive if wall-clock runs out. Logs land in benchmarks/results_r5/.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=benchmarks/results_r5
mkdir -p "$OUT" "$OUT/lorenz" "$OUT/sv" "$OUT/spatial"

run() {  # run NAME TIMEOUT_S CMD...
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a "$OUT/chain.log"
  timeout "$tmo" "$@" >"$OUT/$name.out" 2>&1
  local rc=$?
  echo "=== $name done rc=$rc $(date -u +%H:%M:%S) ===" | tee -a "$OUT/chain.log"
}

# 1. Tuned kalman-1 (VERDICT item 1b): alpha 0.7 and 0.8.
run kalman1_tuned 900 python benchmarks/headline_ess.py --order 1 --alpha 0.7 0.8

# 2. Particle-family ESS/sec incl. the config-5 particle count (items 1d/6).
run particle_ess 2700 python benchmarks/particle_ess.py sv_csmc sv_csmc_guided theta_pgas pit128 pit1024 pit4096

# 3. Lorenz Mider reproduction (item 4), fast freqs first.
for FREQ in 8 4 2 1; do
  run "lorenz_freq${FREQ}" 2400 python -m aux_ssm_tpu.experiments.lorenz \
    --data mider --freq "$FREQ" --parallel \
    --n-samples 100000 --burnin 2500 \
    --target-alpha 0.234 --lr 1.0 --delta-init 1e-5 \
    --seed 123 --out "$OUT/lorenz/mider_freq${FREQ}.npz"
done
run lorenz_fig 600 python -m aux_ssm_tpu.experiments.figures lorenz \
  $(for F in 1 2 4 8; do [ -f "$OUT/lorenz/mider_freq${F}.npz" ] && echo "--run ${F}=$OUT/lorenz/mider_freq${F}.npz"; done) \
  --out-dir "$OUT/lorenz"

# 4. SV sweep at reference scale (item 5).
run sv_sweep 3600 bash benchmarks/sv_sweep.sh "$OUT/sv"
run sv_fig 600 python -m aux_ssm_tpu.experiments.figures sv \
  $(for S in kalman1 kalman2 csmc_no-gradient csmc_gradient csmc_guided_no-gradient csmc_guided_gradient; do \
      [ -f "$OUT/sv/$S.npz" ] && echo "--run $S=$OUT/sv/$S.npz"; done) \
  --n-samples 10000 --out-dir "$OUT/sv"

# 5. Spatial sweep at reference scale (item 5).
run spatial_sweep 4500 bash benchmarks/spatial_sweep.sh "$OUT/spatial"
run spatial_fig 600 python -m aux_ssm_tpu.experiments.figures spatial \
  $(for S in kalman_no-gradient kalman_gradient csmc_no-gradient csmc_gradient csmc_guided_no-gradient csmc_guided_gradient; do \
      [ -f "$OUT/spatial/$S.npz" ] && echo "--run $S=$OUT/spatial/$S.npz"; done) \
  --n-samples 10000 --out-dir "$OUT/spatial"

echo "=== chain complete $(date -u +%H:%M:%S) ===" | tee -a "$OUT/chain.log"
