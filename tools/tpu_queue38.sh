#!/bin/bash
# Round-4 pass #38: ws planner v2 (cost-model block search, non-dividing
# bn / cdiv stripes) kernel-level A/B + numerics at the seven DiT linear
# shapes, then the sd35-large step attribution under the new plans.
# NOTE: the session-4 master ran this BEFORE queue 37 (chain 38 -> 39 ->
# 37) so the final sweep picked up default flips decided on 38/39 data.
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

run "MLIS_WS_FILTER=qkv python tools/q8_ws_ab.py"
run "MLIS_WS_FILTER=out,up python tools/q8_ws_ab.py"
run "MLIS_WS_FILTER=dn python tools/q8_ws_ab.py"
run "MLIS_STEP_MODEL=sd35-large python tools/step_bench.py"
echo "=== QUEUE38 DONE ==="
