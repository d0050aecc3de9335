#!/bin/bash
# Round-5 queue 7 (after queue6's DONE marker): discriminate the
# deep-select residual (m = 1.39e-3 +/- 0.86e-3 at the s2n>10 cut,
# pm_select_deep.log). Two runs:
#   - a null-control at a never-binding cut (s2n>2): if the estimator
#     itself is sound, m must return to the method-intrinsic ~3e-4;
#   - the binding cut with BOTH estimators (Sheldon & Huff explicit
#     Rsel vs the shear-consistent per-type selection the reference's
#     own oracle uses): if m_cons is green while m_SH is ~1.3e-3, the
#     residual is the S&H first-order truncation at a hard cut, not a
#     pipeline bias.
set -u
cd "$(dirname "$0")/.."
mkdir -p tools/tpu_logs
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a tools/tpu_logs/queue.log; }

while ! grep -q "R5 QUEUE6 DONE" tools/tpu_logs/queue.log; do
  sleep 60
done

run() {
  name=$1; budget=$2; shift 2
  log "START $name (budget ~${budget}s): $*"
  "$@" > "tools/tpu_logs/$name.log" 2>&1
  rc=$?
  log "END $name rc=$rc ($(tail -c 300 "tools/tpu_logs/$name.log" | tr '\n' ' '))"
}

run pm_sel_null 2400 python tools/validate_scale.py --pm --measure exp-lm --select --select-cut 2.0 --nbatch 500
run pm_sel_both 3600 python tools/validate_scale.py --pm --measure exp-lm --select --select-cut 10.0 --nbatch 1000
log "R5 QUEUE7 DONE"
