#!/usr/bin/env bash
# Round-5 PIT N=4096 A/B: stage-2 mapping (gumbel vs icdf) x stage-1
# column-super aggregation (128 vs 512), same session, same harness
# (`csmc_speed.py pit4096`). Run on an idle host.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-benchmarks/results_r5/pit_ab.out}
: > "$OUT"
run() {
  echo "--- $1" | tee -a "$OUT"
  shift
  env "$@" timeout 900 python benchmarks/csmc_speed.py pit4096 2>&1 \
    | grep -v WARNING | tee -a "$OUT"
}
run "gumbel G=128 (r4 stream)" AUX_SSM_STAGE2=gumbel
run "icdf G=128 (new default)" AUX_SSM_STAGE2=icdf
run "icdf G=512 super" AUX_SSM_STAGE2=icdf AUX_SSM_COL_SUPER=512
run "gumbel G=512 super (r5-early reject)" AUX_SSM_STAGE2=gumbel AUX_SSM_COL_SUPER=512
