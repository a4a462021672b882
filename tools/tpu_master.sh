#!/bin/bash
# Waits for the axon relay to come back, then runs the queued perf passes
# in order.  Probe: one devices() dial, bounded.  Logs to /tmp/tpu_master.log.
set -u
cd "$(dirname "$0")/.."
echo "$(date +%H:%M) waiting for axon relay..."
for i in $(seq 1 80); do
  if timeout 300 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; then
    echo "$(date +%H:%M) relay healthy (probe $i)"
    break
  fi
  sleep 420
done
bash tools/tpu_queue13.sh
bash tools/tpu_queue14.sh
bash tools/tpu_queue15.sh
bash tools/tpu_queue16.sh
bash tools/tpu_queue17.sh
bash tools/tpu_queue18.sh
bash tools/tpu_queue19.sh
echo "=== MASTER DONE ==="
