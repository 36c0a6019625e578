#!/bin/bash
# Round-5 second hardware queue: the measurements the first r5 queue
# spawned — laplace-init A/B on the real north-star posterior, the
# PVRS widening of the polish regret A/B, and the 32k row fit re-run
# with the subsampled ML-II warm start. Probe-gated; riskiest last.
cd /root/repo
LOG=${QUEUE_LOG:-/tmp/r5b_queue.log}
: > $LOG
probe() {
  timeout 90 python -c "import jax; print('PROBE_OK', float(jax.numpy.ones((8,)).sum()))"
}
wait_device() {
  until probe >> $LOG 2>&1; do
    echo "TUNNEL DOWN $(date +%H:%M:%S) - waiting 300s" >> $LOG
    sleep 300
  done
}
run() {
  wait_device
  echo "=== $* $(date +%H:%M:%S)" >> $LOG
  timeout ${ITEM_TIMEOUT:-2400} "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date +%H:%M:%S)" >> $LOG
}
# 1) Laplace cold-init A/B on the north-star posterior (sampler-research
#    arm 2): control = this morning's demix ladder (1.380/1.187/1.127/
#    1.095); treatment = MAP-refined Laplace ensemble start.
run env BENCH_MAX_STEPS=4800 BENCH_INIT=laplace python benchmarks/bench_moves.py demix
# 2) Polish regret A/B widened to PVRS (default-flip evidence).
run env BENCH_ACQ=pvrs python benchmarks/bench_polish.py grid 4
run env BENCH_ACQ=pvrs python benchmarks/bench_polish.py polish 4
# 3) n=32768 row-mode FULL fit with ml2_subsample=8192 (riskiest last:
#    long-program tunnel-worker crash class, CLAUDE.md gotcha 9).
ITEM_TIMEOUT=5400
run python benchmarks/bench_large_fit.py row 32768
echo "QUEUE R5B DONE $(date)" >> $LOG
