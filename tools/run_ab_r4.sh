#!/bin/bash
set -u
cd "$(dirname "$0")/.."
mkdir -p tools/tpu_logs
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a tools/tpu_logs/queue.log; }
run() {
  name=$1; shift
  log "START $name: $*"
  "$@" > "tools/tpu_logs/$name.log" 2>&1
  log "END $name rc=$? ($(tail -c 300 "tools/tpu_logs/$name.log" | tr '\n' ' '))"
}
run ab_mb_e2 python tools/ab_mb_objective.py 2048 2 1 4
run ab_mb_e3b2 python tools/ab_mb_objective.py 2048 3 2 4
run ab_mb_b4096 python tools/ab_mb_objective.py 4096 3 2 3
run ab_cascade python tools/ab_cascade.py 10240 4
log "AB_R4 DONE"
