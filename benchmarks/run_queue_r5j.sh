#!/bin/bash
# Final round-5 validation: full bench.py on the final tree (confirms
# the headline before the driver's official end-of-round run). Waits
# for the r5i ladder queue to finish so the chip is never shared
# (axon timing rule: one benched process at a time).
cd /root/repo
LOG=${QUEUE_LOG:-/tmp/r5j_queue.log}
: > $LOG
until grep -q "QUEUE R5I DONE" /tmp/r5i_queue.log 2>/dev/null; do
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
for attempt in 1 2 3; do
  wait_device
  echo "=== attempt $attempt: bench.py $(date +%H:%M:%S)" >> $LOG
  timeout 3600 python bench.py >> $LOG 2>&1
  rc=$?
  echo "--- exit=$rc $(date +%H:%M:%S)" >> $LOG
  if [ $rc -eq 0 ]; then break; fi
  sleep 120
done
echo "QUEUE R5J DONE $(date)" >> $LOG
