#!/bin/bash
# Round-5 queue 10: same-session A/Bs of the analytic-flux-column and
# variable-projection LM variants at the headline shape. Correctness
# asserted inside the tool (per-lane agreement + m) before timing.
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

run ab_fluxcol 1200 python tools/ab_fluxcol.py 10240 6 fluxcol
run ab_varpro  1200 python tools/ab_fluxcol.py 10240 6 varpro
log "R5 QUEUE10 DONE"
