#!/bin/bash
# Round-3 pass #12: SD3.5-large 8B int8 first hardware numbers + SD
# regression sweep after the round's model/solver additions.
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ==="
  for attempt in 1 2 3; do
    out=$(eval "${*/python/timeout 2400 python}" 2>&1)
    echo "$out" | grep -E "RESULT|PASS|FAIL|OK|compile|rror|xcept|GiB|metric|run |diff|finite|int8"
    if ! echo "$out" | grep -q "Unable to initialize backend"; then
      return
    fi
    echo "--- backend unavailable (attempt $attempt), retrying in 120s"
    sleep 120
  done
}

run "MLIS_BENCH=sd35-large python bench.py"
run "MLIS_BENCH=sd15,sdxl,sd3 python bench.py"
echo "=== QUEUE14 DONE ==="
