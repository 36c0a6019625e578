#!/bin/bash
# Round-5 fourth queue: the laplace ladder on the FD-fallback Hessian.
# Waits for r5c (32k fit) to release the device first.
cd /root/repo
LOG=${QUEUE_LOG:-/tmp/r5d_queue.log}
: > $LOG
while [ -f /tmp/r5c_queue.pid ] && ! grep -q "QUEUE R5C DONE" /tmp/r5c_queue.log 2>/dev/null; do
  echo "waiting for r5c $(date +%H:%M:%S)" >> $LOG
  sleep 120
done
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
echo "QUEUE R5D DONE $(date)" >> $LOG
