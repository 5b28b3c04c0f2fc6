#!/bin/bash
# Round-5 suite pass 4: reduced-batch fallbacks for the three scenes
# whose FULL-protocol XLA jit deterministically crashes the axon remote
# compile helper (tpu_compile_helper exit 1 -> HTTP 500) even with
# MJWT_PALLAS=0: aloha_pot, aloha_sdf, apptronik_apollo_terrain.
# A smaller world count is recorded honestly in the row's nworld field.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-BENCH_suite_r05.jsonl}
run() {
  local name=$1; shift
  echo "=== $name $* $(date +%H:%M:%S) ==="
  env "$@" MJWT_PROBE_TIMEOUT=300 timeout "${SCENE_TIMEOUT:-3000}" \
    python benchmarks/suite.py "$name" --out "$OUT" 2>&1 |
    grep -v -E "WARNING.*axon|^WARNING:absl" | tail -2
}
has() { grep -q "\"metric\": \"$1_steps_per_sec\"" "$OUT"; }

has aloha_sdf || run aloha_sdf MJWT_PALLAS=0 BENCH_NWORLD=1024 BENCH_NSTEP=200
has aloha_sdf || run aloha_sdf MJWT_PALLAS=0 BENCH_NWORLD=256 BENCH_NSTEP=100
has apptronik_apollo_terrain || run apptronik_apollo_terrain MJWT_PALLAS=0 BENCH_NWORLD=1024 BENCH_NSTEP=200
has apptronik_apollo_terrain || run apptronik_apollo_terrain MJWT_PALLAS=0 BENCH_NWORLD=256 BENCH_NSTEP=100
has aloha_pot || run aloha_pot MJWT_PALLAS=0 BENCH_NWORLD=256 BENCH_NSTEP=100
has aloha_cloth || run aloha_cloth BENCH_NWORLD=8 MJWT_STEP_CHUNK=2
echo PASS4_DONE
