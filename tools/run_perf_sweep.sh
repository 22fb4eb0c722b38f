#!/bin/bash
# Round-3/4 TPU perf sweep (run when the axon tunnel is healthy; each leg is
# independent and logs one JSON/summary line — record outcomes in BASELINE.md).
#
#   sh tools/run_perf_sweep.sh [logfile]
#
# Legs:
#   1. remat-policy A/B on the train step (targets the 44.4 ms copy/transpose
#      bucket in the round-2 train-step breakdown): default vs checkpoint_dots
#      vs dots_with_no_batch_dims_saveable.
#   2. scan-unroll A/B on the sampler (targets the on-device share of the
#      e2e-vs-per-step gap): DIFASHION_SCAN_UNROLL=1 vs 2, differential timing.
#   3. bench.py end to end (validates the dual-mode output: pndm_50step headline
#      + dpmpp_20step secondary).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/perf_sweep.log}
: > "$LOG"

run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 3000 "$@" 2>&1 | tail -5 | tee -a "$LOG"
}

# 1. remat-policy A/B (order: baseline first so a mid-sweep failure still yields
#    a comparable pair)
run python tools/bench_train.py --remat --adam8bit --iters 5
run python tools/bench_train.py --remat --adam8bit --iters 5 --remat_policy dots
run python tools/bench_train.py --remat --adam8bit --iters 5 --remat_policy dots_no_batch

# 2. sampler scan-unroll A/B (differential per-step timing cancels RTT)
run env DIFASHION_SCAN_UNROLL=1 python tools/bench_sampler_steps.py --label unroll1
run env DIFASHION_SCAN_UNROLL=2 python tools/bench_sampler_steps.py --label unroll2

# 3. end-to-end bench, both serving modes
run python bench.py

echo "sweep complete -> $LOG"
