#!/bin/bash
# Round-4 third hardware queue: final headline bench (with the demix
# time-to-convergence leg), production-loop re-validation, the MXU
# roofline closure, the post-cut solve composite, and the large-n
# end-to-end tiers (riskiest 16384 items LAST — a worker crash there
# only costs the tail). One process per timed variant (axon timing
# rule); serialized; probe-gated so a dead tunnel pauses, not kills,
# the queue.
cd /root/repo
LOG=${QUEUE_LOG:-/tmp/r4c_queue.log}
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
# 1) Final round headline + warm-loop re-validation.
run python bench.py
run python examples/production_loop.py
# 2) MXU roofline closure (VERDICT r3 weak #5).
run python benchmarks/bench_roofline.py matmul 8192
run python benchmarks/bench_roofline.py matmul-bf16 8192
run python benchmarks/bench_roofline.py chol 8192
run python benchmarks/bench_roofline.py trailing 8192
# 3) Post-cut solve composite re-validation.
run python benchmarks/bench_solve_sweep.py 8192
# 4) Dense end-to-end tiers (walker-chunked path).
run python benchmarks/bench_large_fit.py dense 8192
# 5) Riskiest last: n=16384 end-to-end (host-driver ML-II config).
run python benchmarks/bench_large_fit.py dense 16384
run python benchmarks/bench_large_fit.py row 16384
echo "QUEUE R4C MAIN $(date)" >> $LOG
# appended mid-run: trailing-precision A/B at the matmul-bound shape
run python benchmarks/bench_roofline.py chol-trailhigh 8192
run python benchmarks/bench_roofline.py chol 4096
run python benchmarks/bench_roofline.py chol-trailhigh 4096
echo "QUEUE R4C TAIL DONE $(date)" >> $LOG
# appended: triangle-split trailing-update A/B (roofline follow-up).
# HISTORICAL: these ran 2026-08-19 (126.9/128.5 ms — LOST, code cut);
# re-running now errors on the removed variants, by design.
run python benchmarks/bench_roofline.py chol-split1 8192
run python benchmarks/bench_roofline.py chol-split2 8192
run env  BENCH_DUMMY=1 python benchmarks/bench_roofline.py chol 8192
echo "QUEUE R4C SPLIT DONE $(date)" >> $LOG
# retry: dense 16384 was probe-aborted by a tunnel drop at 12:31
run python benchmarks/bench_large_fit.py dense 16384
echo "QUEUE R4C RETRY DONE $(date)" >> $LOG
