#!/bin/bash
# Round-5 queue 3: re-run the full bench at HEAD (the mb folded-layout
# commit f2bf8ed landed after the last green bench), finish the mb
# E=3 OOM-regression sweep that died with the previous session, and
# the deep (3M-stamp) realistic-noise rows.
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

run bench_final_r5 1200 python bench.py
run mb_6144_e3     1800 python tools/sweep_mb_batch.py 3 2 3
run pm_explm_deep  2400 python tools/validate_scale.py --pm --measure exp-lm --nbatch 1500
run pm_select_deep 2400 python tools/validate_scale.py --pm --measure exp-lm --select --nbatch 1500
log "R5 QUEUE3 DONE"
