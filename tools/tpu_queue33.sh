#!/bin/bash
# Round-4 pass #33: single-K-block dq kernel for odd-128-multiple K
# (sd35-large d_model 2432).  Expect the 1305 ms non-attention step cost
# to drop toward the 233 ms linear floor.
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
run "MLIS_BENCH=sd35-large python bench.py"
run "MLIS_BENCH=sd35-large-q4 python bench.py"
run "MLIS_BENCH=sd15-q8 python bench.py"
echo "=== QUEUE33 DONE ==="
