#!/bin/bash
# Round-5 hardware queue (VERDICT r4 items #2/#3/#4/#8 + headline
# re-validation on the convergence-honest-defaults tree). One process
# per timed variant (axon timing rule); serialized; probe-gated so a
# dead tunnel pauses, not kills, the queue; riskiest items (32k tier)
# LAST so a worker crash only costs the tail.
cd /root/repo
LOG=${QUEUE_LOG:-/tmp/r5_queue.log}
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
# 1) Headline bench on the round-5 tree (now also records the demix
#    headline variant + time-to-convergence in one run) — this is the
#    exact file the driver executes at round end, so validate it first.
run python bench.py
# 2) Converged-by-construction production loop (VERDICT r4 #8 artifact)
#    + the plain warm-loop re-validation.
run python examples/production_loop.py --converged
run python examples/production_loop.py
# 3) Sampler ladder on the REAL north-star posterior (VERDICT r4 #2):
#    DREAM subspace-crossover candidates vs the demix control, same
#    session, 1200-step warm chunks, stop at R-hat<1.1.
# (ran 2026-08-20: dream/dream9/decr measured and REJECTED — de_cr
# deleted; demix ladder kept runnable)
run env BENCH_MAX_STEPS=4800 python benchmarks/bench_moves.py demix
# 4) Gradient-polish regret A/B on Hartmann-6 (VERDICT r4 #3): equal
#    seeds per arm, per-iteration wall-clock for the equal-time read.
run python benchmarks/bench_polish.py grid 4
run python benchmarks/bench_polish.py polish 4
# 5) n=32768 row-mode tier (VERDICT r4 #4) — riskiest last (the
#    long-program tunnel-worker crash class, CLAUDE.md gotcha 9).
ITEM_TIMEOUT=3600
run python benchmarks/bench_dist_lml.py 32768 sharded
ITEM_TIMEOUT=5400
run python benchmarks/bench_large_fit.py row 32768
echo "QUEUE R5 DONE $(date)" >> $LOG
