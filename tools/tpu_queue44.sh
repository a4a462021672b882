#!/bin/bash
# Round-5 pass #44: queue-40's e2e legs, re-run (the session-2 chain's
# /tmp logs were lost to a host reset before harvest; the kernel-table
# half of queue 40 was committed, these e2e rows were not).
#  1. sd35-large / flux / sd3 e2e under the shipped int8ws=auto default.
#  2. int8ws=off anchors (isolate the candidacy's e2e contribution).
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ==="
  for attempt in 1 2 3; do
    out=$(eval "${*/python/timeout 3000 python}" 2>&1)
    echo "$out" | grep -E "RESULT|PASS|FAIL|OK|compile|rror|xcept|GiB|metric|run |diff|finite|synth|percol"
    if ! echo "$out" | grep -q "Unable to initialize backend"; then
      return
    fi
    echo "--- backend unavailable (attempt $attempt), retrying in 120s"
    sleep 120
  done
}

run "MLIS_BENCH=sd35-large python bench.py"
run "MLIS_BENCH=flux-schnell python bench.py"
run "MLIS_BENCH=flux-dev python bench.py"
run "MLIS_BENCH=sd3 python bench.py"
run "MLIS_Q8_INT8WS=off MLIS_BENCH=sd35-large python bench.py"
run "MLIS_Q8_INT8WS=off MLIS_BENCH=flux-schnell python bench.py"
echo "=== QUEUE44 DONE ==="
