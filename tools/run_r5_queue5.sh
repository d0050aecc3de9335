#!/bin/bash
# Round-5 queue 5 (runs after queue4's DONE marker): a full bench at
# the restructured secondaries (standalone solvers timed at the
# headline batch), then full-gate benches at B=8192 (round-3 sessions
# read ~33k at this single-program shape; a green gate + faster rate
# here is the only legitimate way to retune the default) and B=18432
# (VERDICT #4: multi-chunk [10240, 8192] schedule through the
# bounded-in-flight dispatcher must complete without
# RESOURCE_EXHAUSTED).
# ONE job at a time, no timeouts (killing a client mid-program wedges
# the chip).
set -u
cd "$(dirname "$0")/.."
mkdir -p tools/tpu_logs
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a tools/tpu_logs/queue.log; }

# wait for queue4 to finish (serialize: ONE TPU, concurrent jobs
# corrupt each other's wall-clock)
while ! grep -q "R5 QUEUE4 DONE" tools/tpu_logs/queue.log; do
  sleep 60
done

run() {
  name=$1; budget=$2; shift 2
  log "START $name (budget ~${budget}s): $*"
  "$@" > "tools/tpu_logs/$name.log" 2>&1
  rc=$?
  log "END $name rc=$rc ($(tail -c 300 "tools/tpu_logs/$name.log" | tr '\n' ' '))"
}

run bench_r5c   1200 python bench.py
run bench_8192  1200 python bench.py 8192
run bench_18432 1500 python bench.py 18432
log "R5 QUEUE5 DONE"
