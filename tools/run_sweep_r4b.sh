#!/bin/bash
set -u
cd "$(dirname "$0")/.."
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a tools/tpu_logs/queue.log; }
run() {
  name=$1; shift
  log "START $name: $*"
  "$@" > "tools/tpu_logs/$name.log" 2>&1
  log "END $name rc=$? ($(tail -c 300 "tools/tpu_logs/$name.log" | tr '\n' ' '))"
}
run sweep_mb2 python tools/sweep_mb_batch.py 3 2 4
run solver_iso2 python tools/profile_mb_solver.py 12288 2 4
run sweep_headline python tools/sweep_headline_chunk.py 4
log "SWEEP_R4B DONE"
