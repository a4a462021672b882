#!/bin/bash
# Round-4 pass #34: sdxl-q8 and sd3-q8 re-run after the single-K-block
# kernel fix (SDXL K=640/1920 are odd 128-multiples too).
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
run "MLIS_BENCH=sdxl-q8 python bench.py"
run "MLIS_BENCH=sd15-q4 python bench.py"
run "MLIS_BENCH=flux-schnell python bench.py"
echo "=== QUEUE34 DONE ==="
