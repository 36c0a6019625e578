#!/bin/bash
# Prioritized hardware measurement queue (round-4 head; tunnel recovered).
# Decision-critical A/Bs first, full validation last. One process per
# timed variant (axon timing rule); serialized.
cd /root/repo
LOG=${QUEUE_LOG:-/tmp/r4_queue.log}
: > $LOG
run() {
  echo "=== $* $(date +%H:%M:%S)" >> $LOG
  timeout ${ITEM_TIMEOUT:-1200} "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date +%H:%M:%S)" >> $LOG
}
# 1) Panel-kernel A/B: decides the PALLAS_PANEL default.
run python benchmarks/bench_chol_breakdown.py full-nopanel
run python benchmarks/bench_chol_breakdown.py full-panel
run python benchmarks/bench_chol_breakdown.py ppanel128
run python benchmarks/bench_chol_breakdown.py pbase32
# 2) Fused-gram acquisition A/B.
run python benchmarks/bench_acq_breakdown.py gram
run python benchmarks/bench_acq_breakdown.py gram-fused
run python benchmarks/bench_acq_breakdown.py chol
run python benchmarks/bench_acq_breakdown.py chol-fused
run python benchmarks/bench_acq_breakdown.py full
# 3) dist-LML one-device overhead A/B.
run python benchmarks/bench_dist_lml.py 4096 plain
run python benchmarks/bench_dist_lml.py 4096 sharded
run python benchmarks/bench_dist_lml.py 4096 sharded-unroll
# 4) Gram variants.
run python benchmarks/bench_gram_tile.py 256
run python benchmarks/bench_gram_tile.py 512
run python benchmarks/bench_gram_wb.py 2
run python benchmarks/bench_gram_wb.py 5
# 5) nb re-shootout under whatever panel decision falls out (manual).
run python benchmarks/bench_chol_variants.py blocked
run python benchmarks/bench_chol_variants.py blocked-nb256
# 6) Full validation.
run python bench.py
run python examples/production_loop.py
echo "QUEUE DONE $(date)" >> $LOG
