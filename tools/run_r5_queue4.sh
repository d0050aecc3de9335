#!/bin/bash
# Round-5 queue 4: rerun the mb E=3 sweep with the fixed flat
# comparator (the 14:43 run predated the production-closure fix, so
# its B=2048 ratio was measured against the artifact-fast wrong-code
# program and B=6144 died in the bare-jit flat side), then the deep
# (3M-pair) realistic-noise rows to tighten se_m below the 1e-3 gate.
# ONE job at a time, no timeouts (killing a client mid-program wedges
# the chip).
set -u
cd "$(dirname "$0")/.."
mkdir -p tools/tpu_logs
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a tools/tpu_logs/queue.log; }

run() {
  name=$1; budget=$2; shift 2
  log "START $name (budget ~${budget}s): $*"
  "$@" > "tools/tpu_logs/$name.log" 2>&1
  rc=$?
  log "END $name rc=$rc ($(tail -c 300 "tools/tpu_logs/$name.log" | tr '\n' ' '))"
}

run mb_6144_e3b    1800 python tools/sweep_mb_batch.py 3 2 3
run pm_explm_deep  3600 python tools/validate_scale.py --pm --measure exp-lm --nbatch 1500
run pm_select_deep 5400 python tools/validate_scale.py --pm --measure exp-lm --select --nbatch 1500
log "R5 QUEUE4 DONE"
