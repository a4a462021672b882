#!/bin/bash
# Round-4 pass #22: CORRECTED stock-flash A/B.  Queue #21's stock entry
# was loop-invariant (the call ignored the scan carry) and hoisted out
# of the scan — its 1.47 ms was an artifact.  flash_stock_ab.py chains
# every variant on the carry and adds segment-ids (masked-pad) numerics.
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ==="
  for attempt in 1 2 3; do
    out=$(eval "${*/python/timeout 2400 python}" 2>&1)
    echo "$out" | grep -E "RESULT|PASS|FAIL|OK|compile|rror|xcept|GiB|metric|run |diff|finite|synth"
    if ! echo "$out" | grep -q "Unable to initialize backend"; then
      return
    fi
    echo "--- backend unavailable (attempt $attempt), retrying in 120s"
    sleep 120
  done
}

echo "$(date +%H:%M) waiting for axon relay..."
for i in $(seq 1 80); do
  if timeout 300 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; then
    echo "$(date +%H:%M) relay healthy (probe $i)"
    break
  fi
  sleep 420
done

run "python tools/flash_stock_ab.py"
echo "=== QUEUE22 DONE ==="
