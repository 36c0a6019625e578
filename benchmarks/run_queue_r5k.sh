#!/bin/bash
# Round-5 continuation: the r5i parameterized-demix tuning ladder,
# reordered so the mode-hopping levers (jump prob, snooker weight) run
# first — on the measured-bimodal north-star posterior those are the
# hypotheses most likely to beat demix's 1.095@4800. Control numbers
# (demix) are the r5 ladder's — identical seeds/starts, no re-run.
# Probe-gated, one variant per process (axon timing rule).
cd /root/repo
LOG=${QUEUE_LOG:-/tmp/r5k_queue.log}
: > $LOG
probe() {
  timeout 90 python -c "import jax; print('PROBE_OK', float(jax.numpy.ones((8,)).sum()))"
}
wait_device() {
  until probe >> $LOG 2>&1; do
    echo "TUNNEL DOWN $(date +%H:%M:%S) - waiting 240s" >> $LOG
    sleep 240
  done
}
for variant in demixj25 demixs35 demixj25s35 demixg55; do
  wait_device
  echo "=== bench_moves $variant $(date +%H:%M:%S)" >> $LOG
  BENCH_MAX_STEPS=4800 timeout 2700 python benchmarks/bench_moves.py $variant >> $LOG 2>&1
  echo "--- exit=$? $(date +%H:%M:%S)" >> $LOG
done
echo "QUEUE R5K DONE $(date)" >> $LOG
