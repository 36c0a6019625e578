#!/bin/bash
# Round-4 second hardware queue: in-chain tile A/B, move-mixture chain
# cost, then the north-star moves convergence ladder (the decision
# measurement for the default move mixture). One process per timed
# variant (axon timing rule); serialized.
cd /root/repo
LOG=${QUEUE_LOG:-/tmp/r4b_queue.log}
: > $LOG
# The axon tunnel hangs for hours at a time; gate every item on a cheap
# probe so a dead tunnel costs a 90 s probe + sleep, not the item's full
# 2400 s timeout, and the queue resumes by itself on recovery.
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
# 1) in-chain gram tile A/B (standalone: 512 wins 0.385 vs 0.464 ms)
run python benchmarks/bench_chain.py
run env BENCH_TILE=512 python benchmarks/bench_chain.py
# 2) move-mixture per-step cost (same workload, demix moves)
run env BENCH_MOVES=demix python benchmarks/bench_chain.py
# 3) north-star convergence ladder: stretch vs demix vs tri
run env BENCH_MAX_STEPS=7200 python benchmarks/bench_moves.py stretch
run env BENCH_MAX_STEPS=7200 python benchmarks/bench_moves.py demix
run env BENCH_MAX_STEPS=7200 python benchmarks/bench_moves.py tri
# 4) right- vs left-looking blocked solves at large n (VERDICT #5)
run python benchmarks/bench_solve_sweep.py 8192 right
run python benchmarks/bench_solve_sweep.py 8192 left
run python benchmarks/bench_solve_sweep.py 4096 right
run python benchmarks/bench_solve_sweep.py 4096 left
# 4b) acq pass under the right-looking solves (the 03:2x numbers ran
# the old left-looking ones)
run python benchmarks/bench_acq_breakdown.py full
run python benchmarks/bench_acq_breakdown.py chol-fused
# 5) END-TO-END large-n fits (VERDICT #3)
run python benchmarks/bench_large_fit.py dense 4096
run python benchmarks/bench_large_fit.py row 8192
run python benchmarks/bench_large_fit.py row 16384
run env LARGE_N_MESH_BACKEND=native python examples/large_n_mesh.py
echo "QUEUE R4B DONE $(date)" >> $LOG
