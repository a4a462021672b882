#!/bin/bash
# Round-4 pass #30: esrgan finite re-run (gain-0.3 synthetic weights).
set -u
cd "$(dirname "$0")/.."
run() {
  echo "=== $* ==="
  for attempt in 1 2 3; do
    out=$(eval "${*/python/timeout 3000 python}" 2>&1)
    echo "$out" | grep -E "RESULT|PASS|FAIL|OK|compile|rror|xcept|GiB|metric|run |diff|finite|synth"
    if ! echo "$out" | grep -q "Unable to initialize backend"; then
      return
    fi
    echo "--- backend unavailable (attempt $attempt), retrying in 120s"
    sleep 120
  done
}
run "MLIS_BENCH=esrgan-x4 python bench.py"
echo "=== QUEUE30 DONE ==="
