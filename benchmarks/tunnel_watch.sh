#!/bin/bash
# Probe the axon tunnel every 3 min; when a device op completes, run the
# prioritized round-4 measurement queue. Log: /tmp/tunnel_watch.log
cd /root/repo
LOG=/tmp/tunnel_watch.log
: > $LOG
probe() {
  timeout 180 python - <<'EOF' > /tmp/tunnel_probe.out 2>&1
import sys; sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
print('PROBE_OK', float(x[0, 0]), jax.devices())
EOF
}
while true; do
  echo "probe $(date +%H:%M:%S)" >> $LOG
  if probe && grep -q PROBE_OK /tmp/tunnel_probe.out; then
    echo "TUNNEL UP $(date +%H:%M:%S)" >> $LOG
    cat /tmp/tunnel_probe.out >> $LOG
    bash benchmarks/run_queue_r4.sh
    echo "WATCH DONE $(date)" >> $LOG
    exit 0
  fi
  sleep 180
done
