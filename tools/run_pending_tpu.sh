#!/bin/bash
# Serial TPU validation queue for the round-4 pending list (CLAUDE.md).
# Run as a single tracked background task the moment the axon tunnel
# recovers; it serializes every TPU job (one chip - concurrent jobs
# corrupt each other's timings) and logs to tools/tpu_logs/.
set -u
cd "$(dirname "$0")/.."
mkdir -p tools/tpu_logs
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a tools/tpu_logs/queue.log; }

# NO timeouts: killing a client mid-TPU-program leaves the in-flight
# program running on the chip and has wedged it for hours before
# (CLAUDE.md). The budget arg is recorded for the log only; a stuck
# job must be waited out or the tunnel is already gone.
run() {
  name=$1; budget=$2; shift 2
  log "START $name (budget ~${budget}s): $*"
  "$@" > "tools/tpu_logs/$name.log" 2>&1
  rc=$?
  log "END $name rc=$rc ($(tail -c 300 "tools/tpu_logs/$name.log" | tr '\n' ' '))"
}

# 1. bench sanity (budget ~12 min; compiles 5 secondary programs too)
run bench 1200 python bench.py

# 2. pending + new sweep rows, ~100k stamps each
run bdf_truth     1500 python tools/validate_scale.py --sweep-row "bdf-lm het (bdf truth)"
run bdf_onbound   1500 python tools/validate_scale.py --sweep-row "bdf-lm het (exp truth, on-bound)"
run mb_nband2     1500 python tools/validate_scale.py --sweep-row "exp-lm mb nband=2"
run bdf_mb_nband2 1800 python tools/validate_scale.py --sweep-row "bdf-lm mb nband=2 (bdf truth)"
run pgauss_2048   1500 python tools/validate_scale.py --sweep-row "pgauss het"
run ksigma_2048   1500 python tools/validate_scale.py --sweep-row "ksigma het"
# drift re-checks of two recorded rows
run explm_recheck 1200 python tools/validate_scale.py --sweep-row "exp-lm het"
run gaussmom_recheck 1200 python tools/validate_scale.py --sweep-row "gaussmom het"

# 3. mb-vs-flat gap attribution (VERDICT #5)
run profile_mb 1500 python tools/profile_mb.py 2048 2 3

log "QUEUE DONE"
