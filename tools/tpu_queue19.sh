#!/bin/bash
# Round-3 pass #19: DeepCache encoder caching A/B on hardware —
# sd15-dc and sdxl-dc vs their baselines (expected ~1.4-1.8x step-rate
# from skipping deep levels + mid transformer on 2 of 3 steps).
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ==="
  for attempt in 1 2 3; do
    out=$(eval "${*/python/timeout 2400 python}" 2>&1)
    echo "$out" | grep -E "RESULT|PASS|FAIL|OK|compile|rror|xcept|GiB|metric|run |diff|finite|synthes"
    if ! echo "$out" | grep -q "Unable to initialize backend"; then
      return
    fi
    echo "--- backend unavailable (attempt $attempt), retrying in 120s"
    sleep 120
  done
}

run "MLIS_BENCH=sd15-dc python bench.py"
run "MLIS_BENCH=sdxl-dc python bench.py"
echo "=== QUEUE19 DONE ==="
