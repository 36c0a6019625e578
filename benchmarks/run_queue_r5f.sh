#!/bin/bash
# Round-5 fifth queue: 32k row fit retry with a tunnel-sized chain
# program, now with the MAP-seeded warm start (the bare-LML seed
# railed and left the consensus non-PD).
cd /root/repo
LOG=${QUEUE_LOG:-/tmp/r5f_queue.log}
: > $LOG
while ! grep -q "QUEUE R5E DONE" /tmp/r5e_queue.log 2>/dev/null; do
  echo "waiting for r5e $(date +%H:%M:%S)" >> $LOG
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
  timeout ${ITEM_TIMEOUT:-5400} "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date +%H:%M:%S)" >> $LOG
}
run python benchmarks/bench_large_fit.py row 32768
echo "QUEUE R5F DONE $(date)" >> $LOG
