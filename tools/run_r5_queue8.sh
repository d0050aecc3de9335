#!/bin/bash
# Round-5 queue 8: full-gate bench at B=16384 through the new
# validated-ladder dispatcher (schedule [10240, 6144-real padded to
# 8192]) - the shipping validation for the scheduler change - and a
# default-B bench to confirm the single-shot path is untouched.
# ONE job at a time, no timeouts.
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

run bench_16384_ladder 1500 python bench.py 16384
run bench_final_r5b    1200 python bench.py
log "R5 QUEUE8 DONE"
