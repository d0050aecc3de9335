#!/bin/bash
# Remainder of the round-4 queue (session cut off after ksigma_2048).
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
run explm_recheck 1200 python tools/validate_scale.py --sweep-row "exp-lm het"
run gaussmom_recheck 1200 python tools/validate_scale.py --sweep-row "gaussmom het"
run profile_mb 1500 python tools/profile_mb.py 2048 2 3
log "QUEUE_R4B DONE"
