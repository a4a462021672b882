#!/bin/bash
# Round-3 pass #17: SD3.5-medium (MMDiT-X) first hardware bench — dual
# attention + qk-norm + 384-grid pos embed at 1024px, bf16.
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

run "MLIS_BENCH=sd35-medium python bench.py"
echo "=== QUEUE17 DONE ==="
