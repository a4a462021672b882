#!/bin/bash
# Round-4 pass #31: sd35-medium/large step attribution (the two MMDiT
# geometries with e2e numbers but no step/ablation attribution yet).
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
run "MLIS_STEP_MODEL=sd35-medium python tools/step_bench.py"
run "MLIS_ABLATE=attn MLIS_STEP_MODEL=sd35-medium python tools/step_bench.py"
run "MLIS_STEP_MODEL=sd35-large python tools/step_bench.py"
echo "=== QUEUE31 DONE ==="
