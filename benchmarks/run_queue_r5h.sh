#!/bin/bash
# 32k row fit re-run on the empty-chain-guard fix (burn=1, 4 retained
# samples; the r5e/r5g -inf was an empty retained chain, not numerics).
# Probe-gated retry wrapper — the tunnel is flapping today.
cd /root/repo
LOG=${QUEUE_LOG:-/tmp/r5h_queue.log}
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
for attempt in 1 2 3 4 5; do
  wait_device
  echo "=== attempt $attempt: bench_large_fit row 32768 $(date +%H:%M:%S)" >> $LOG
  timeout 5400 python benchmarks/bench_large_fit.py row 32768 >> $LOG 2>&1
  rc=$?
  echo "--- exit=$rc $(date +%H:%M:%S)" >> $LOG
  if [ $rc -eq 0 ] && grep -q "lml -inf" $LOG; then
    echo "STILL -inf — stopping (real numerics issue)" >> $LOG
    break
  fi
  if [ $rc -eq 0 ]; then break; fi
  sleep 120
done
echo "QUEUE R5H DONE $(date)" >> $LOG
