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
run ab_headline python tools/ab_headline_6144.py 4
log "AB_HEADLINE DONE"
