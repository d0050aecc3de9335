#!/bin/bash
# Round-5 queue 9: (a) first-ever stage-level profile of the headline
# pipeline at the shipped B=10240 program shape (where the remaining
# time goes: psf prep / k-ops / pixels / measure); (b) realistic-noise
# (s2n ~ 15) pm rows for the metadetect-style moments estimators
# (admom, gaussmom) - the pm table so far covers exp-lm/pgauss only.
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

run profile_stages_10240 900  python tools/profile_stages.py 10240 5
run pm_admom           1500  python tools/validate_scale.py --pm --measure admom --nbatch 500
run pm_gaussmom        1500  python tools/validate_scale.py --pm --measure gaussmom --nbatch 500
log "R5 QUEUE9 DONE"
