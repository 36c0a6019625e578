#!/bin/bash
# Parameterized-demix tuning ladder (round 5, VERDICT r4 #2 follow-on):
# can a tuned DE jump/gamma or snooker fraction beat demix's
# 1.095@4800 on the north-star posterior? Control (demix) numbers come
# from the r5 ladder — identical seeds/starts, no re-run needed.
# Probe-gated, one variant per process (axon timing rule).
cd /root/repo
LOG=${QUEUE_LOG:-/tmp/r5i_queue.log}
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
for variant in demixj25 demixg55 demixs35 demixj25s35; do
  wait_device
  echo "=== bench_moves $variant $(date +%H:%M:%S)" >> $LOG
  BENCH_MAX_STEPS=4800 timeout 3600 python benchmarks/bench_moves.py $variant >> $LOG 2>&1
  echo "--- exit=$? $(date +%H:%M:%S)" >> $LOG
done
echo "QUEUE R5I DONE $(date)" >> $LOG
