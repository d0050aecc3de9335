#!/bin/bash
# Round-5 queue 11 (final session): confirm the chip is healthy with a
# full default gated bench, then the two pending LM-variant A/Bs
# (flux_col, varpro) at the headline shape. ONE job at a time, no
# timeouts (killing a mid-program client wedges the tunnel).
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

run bench_final_r5c 1200 python bench.py
run ab_fluxcol2 1200 python tools/ab_fluxcol.py 10240 6 fluxcol
run ab_varpro2  1200 python tools/ab_fluxcol.py 10240 6 varpro
log "R5 QUEUE11 DONE"
