#!/bin/bash
# Round-4 pass #32: sd35-large step attribution (int8 weights) + ABLATE.
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
run "MLIS_STEP_MODEL=sd35-large python tools/step_bench.py"
run "MLIS_ABLATE=attn MLIS_STEP_MODEL=sd35-large python tools/step_bench.py"
echo "=== QUEUE32 DONE ==="
