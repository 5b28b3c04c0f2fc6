#!/bin/bash
# Round-5 suite pass 3: targeted re-runs for the scenes pass 2 could not
# bank. Root causes and remedies:
#   apollo_hfield  — ran but exceeded the 3600s budget at nstep=1000
#                    (apollo-class XLA convex path ~1.4 s/step): run the
#                    shorter protocol (nstep=200) and a larger budget.
#   apollo_terrain — fused_solve probe AND main jit crash the remote
#                    compile helper (ng=5290): run pure-XLA.
#   aloha_sdf      — main jit crashes the compile helper: pure-XLA.
#   aloha_cloth    — RESOURCE_EXHAUSTED even with MJWT_STEP_CHUNK=8:
#                    drop to 16 worlds (protocol nworld=32) + chunk 4.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-BENCH_suite_r05.jsonl}
run() {
  local name=$1; shift
  echo "=== $name $(date +%H:%M:%S) ==="
  env "$@" MJWT_PROBE_TIMEOUT=300 timeout "${SCENE_TIMEOUT:-5400}" \
    python benchmarks/suite.py "$name" --out "$OUT" 2>&1 |
    grep -v -E "WARNING.*axon|^WARNING:absl" | tail -3
}
run apptronik_apollo_hfield  BENCH_NSTEP=200
run apptronik_apollo_terrain MJWT_PALLAS=0 BENCH_NSTEP=200
run aloha_sdf                MJWT_PALLAS=0 BENCH_NSTEP=200
run aloha_cloth              BENCH_NWORLD=16 MJWT_STEP_CHUNK=4
# aloha_pot crashed the remote XLA compiler even pure-XLA at the full
# 8192-world protocol; retry solo, then at reduced batch if needed
run aloha_pot                MJWT_PALLAS=0 BENCH_NSTEP=200
grep -q '"metric": "aloha_pot_steps_per_sec"' "$OUT" ||
  run aloha_pot              MJWT_PALLAS=0 BENCH_NWORLD=1024 BENCH_NSTEP=200
# re-runs on the r5c code: blocked linalg (nv=81) + MPR early-exit
run three_humanoids
run apptronik_apollo_flat    BENCH_NSTEP=200
echo PASS3_DONE
