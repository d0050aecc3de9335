#!/bin/bash
# Round-5 queue 6 (after queue5's DONE marker): re-validate m on the
# chip for the three mb sweep rows now that the folded [B*E] solver
# layout is the mb default (CPU tests pin per-lane equality, but the
# round-4 lesson is that shipped TPU shapes need their own m), plus a
# per-lane TPU-vs-CPU diff at the 8192 program shape (the bench_8192
# candidate from queue5).
# ONE job at a time, no timeouts.
set -u
cd "$(dirname "$0")/.."
mkdir -p tools/tpu_logs
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a tools/tpu_logs/queue.log; }

while ! grep -q "R5 QUEUE5 DONE" tools/tpu_logs/queue.log; do
  sleep 60
done

run() {
  name=$1; budget=$2; shift 2
  log "START $name (budget ~${budget}s): $*"
  "$@" > "tools/tpu_logs/$name.log" 2>&1
  rc=$?
  log "END $name rc=$rc ($(tail -c 300 "tools/tpu_logs/$name.log" | tr '\n' ' '))"
}

run mb_row_e2     1200 python tools/validate_scale.py --sweep-row "exp-lm mb E=2"
run mb_row_nband2 1200 python tools/validate_scale.py --sweep-row "exp-lm mb nband=2"
run mb_row_bdf    1500 python tools/validate_scale.py --sweep-row "bdf-lm mb nband=2 (bdf truth)"
run diag_tpu8192  900  python tools/diag_6144.py run 8192 hom tpu8192
run diag_cmp8192  300  python tools/diag_6144.py cmp tools/tpu_logs/diag_cpu8192.npz tools/tpu_logs/diag_tpu8192.npz
log "R5 QUEUE6 DONE"
