#!/bin/bash
# Round-4 pass #21: CLEAN (scalar-fetch) kernel attribution.  The first
# queue-20 flash_sd3_bench run fetched the full 26 MB q tensor through
# the axon tunnel per timing call, drowning every kernel difference
# (all variants "73 ms"); round-3's flash_d_bench d-insensitivity had
# the same bug.  Re-measure with scalar fetches: softmax ablations, the
# grid-overhead hypothesis (blocks -> grid-step count), d=64 vs 128.
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

run "python tools/flash_sd3_bench.py"
run "python tools/flash_d_bench.py"
echo "=== QUEUE21 DONE ==="
