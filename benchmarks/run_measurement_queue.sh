#!/bin/bash
# Hardware measurement queue (round-3 tail; run after tunnel recovery).
# One process per timed variant (axon timing rule); serialized so no
# two timed programs share the chip. Results land in $QUEUE_LOG.
cd /root/repo
LOG=${QUEUE_LOG:-/tmp/r3_queue.log}
: > $LOG
run() {
  echo "=== $* $(date +%H:%M:%S)" >> $LOG
  timeout 2400 "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date +%H:%M:%S)" >> $LOG
}
run python bench.py --quick
run python benchmarks/bench_acq_breakdown.py gram
run python benchmarks/bench_acq_breakdown.py gram-fused
run python benchmarks/bench_acq_breakdown.py chol
run python benchmarks/bench_acq_breakdown.py chol-fused
run python benchmarks/bench_acq_breakdown.py full
run python benchmarks/bench_gram_tile.py 256
run python benchmarks/bench_gram_tile.py 512
run python benchmarks/bench_gram_wb.py 2
run python benchmarks/bench_gram_wb.py 5
run python benchmarks/bench_chol_breakdown.py full-nopanel
run python benchmarks/bench_chol_breakdown.py full-panel
run python benchmarks/bench_chol_breakdown.py ppanel128
run python benchmarks/bench_chol_breakdown.py pbase32
run python benchmarks/bench_chol_variants.py blocked
run python benchmarks/bench_chol_variants.py blocked-nb256
run python benchmarks/bench_chol_breakdown.py full-panel512
run python benchmarks/bench_dist_lml.py 4096 plain
run python benchmarks/bench_dist_lml.py 4096 sharded
run python benchmarks/bench_dist_lml.py 4096 sharded-unroll
run python bench.py
run python examples/production_loop.py
echo "QUEUE DONE $(date)" >> $LOG
