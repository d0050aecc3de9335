#!/bin/bash
# Round-5 serial TPU validation queue: mb epoch-t solver A/B, the
# shipped-shape sweep row, and the realistic-noise (pm) rows.
# Same discipline as run_pending_tpu.sh: ONE job at a time, no
# timeouts (killing a client mid-program wedges the chip).
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

run solver_iso_t  900 python tools/profile_mb_solver.py 12288 2 4
run shipped_shape 900 python tools/validate_scale.py --sweep-row "exp-lm het SHIPPED-SHAPE Bsz=10240"
run pm_explm     1500 python tools/validate_scale.py --sweep-row "exp-lm het s2n~15 (pm)"
run pm_pgauss    1500 python tools/validate_scale.py --sweep-row "pgauss het s2n~15 (pm)"
run pm_select    1500 python tools/validate_scale.py --sweep-row "exp-lm select(s2n>10) s2n~15 (pm)"
run ab_mb_t      1200 python tools/ab_mb_objective.py 2048 3 2 4
log "R5 QUEUE DONE"
