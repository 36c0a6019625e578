#!/bin/bash
# Round-5 third queue: re-runs of the r5b items the tunnel flap killed,
# plus the laplace ladder on the HIGHEST-precision Hessian fix (probe
# first — 2 min — so a still-broken Hessian doesn't burn the 17-min
# ladder slot).
cd /root/repo
LOG=${QUEUE_LOG:-/tmp/r5c_queue.log}
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
run python /tmp/probe_laplace_tpu.py
if grep -q "LAPLACE_PROBE: OK" $LOG; then
  run env BENCH_MAX_STEPS=4800 BENCH_INIT=laplace python benchmarks/bench_moves.py demix
else
  echo "SKIP laplace ladder: probe failed" >> $LOG
fi
run env BENCH_ACQ=pvrs python benchmarks/bench_polish.py polish 4
ITEM_TIMEOUT=5400
run python benchmarks/bench_large_fit.py row 32768
echo "QUEUE R5C DONE $(date)" >> $LOG
