#!/bin/bash
set -u
cd "$(dirname "$0")/.."
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a tools/tpu_logs/queue.log; }
run() {
  name=$1; budget=$2; shift 2
  log "START $name (budget ~${budget}s): $*"
  "$@" > "tools/tpu_logs/$name.log" 2>&1
  rc=$?
  log "END $name rc=$rc ($(tail -c 300 "tools/tpu_logs/$name.log" | tr '\n' ' '))"
}
run solver_iso_f 1200 python tools/profile_mb_solver.py 12288 2 4
run mb_6144_e3   1500 python tools/sweep_mb_batch.py 3 2 3
run pm_explm_deep 1500 python tools/validate_scale.py --pm --measure exp-lm --nbatch 1500
run pm_select_deep 1500 python tools/validate_scale.py --pm --measure exp-lm --select --nbatch 1500
log "R5 QUEUE2 DONE"
