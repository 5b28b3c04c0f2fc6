#!/bin/bash
# Round-5 suite pass 2: one scene per process (a crash cannot take the
# rest), fastest-first so rows bank early, per-scene budget. Run this
# with NOTHING else touching the TPU: a concurrent compile can 500 the
# remote-compile helper and silently cost a scene its Pallas path
# (that is exactly what degraded apollo_flat in pass 1).
#
# aloha_pot: its Mosaic compiles crash the remote compile helper itself
# (exit 1 -> HTTP 500, rounds 3-5) — run it pure-XLA via MJWT_PALLAS=0.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-BENCH_suite_r05.jsonl}
SCENES=${SCENES:-"humanoid franka_emika_panda apptronik_apollo_flat three_humanoids kitchen apptronik_apollo_hfield apptronik_apollo_terrain aloha_sdf aloha_cloth aloha_pot"}
for s in $SCENES; do
  echo "=== $s $(date +%H:%M:%S) ==="
  EXTRA_ENV=()
  if [ "$s" = "aloha_pot" ]; then
    EXTRA_ENV=(MJWT_PALLAS=0)
  fi
  env "${EXTRA_ENV[@]}" MJWT_PROBE_TIMEOUT=300 \
    timeout "${SCENE_TIMEOUT:-3600}" \
    python benchmarks/suite.py "$s" --out "$OUT" 2>&1 |
    grep -v -E "WARNING.*axon|^WARNING:absl" | tail -3
done
echo PASS2_DONE
