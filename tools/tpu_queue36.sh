#!/bin/bash
# Round-4 pass #36: weight-stationary dq kernel A/B.
# Kernel-level at the seven DiT linear shapes (split so each entry's
# compile mass fits the 3000s cap), then e2e/step with MLIS_Q8_WS=auto
# on the models whose linears dominate (sd35-large int8, flux int8/int4).
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
run "MLIS_Q8_WS=auto MLIS_STEP_MODEL=sd35-large python tools/step_bench.py"
run "MLIS_Q8_WS=auto MLIS_BENCH=sd35-large python bench.py"
run "MLIS_Q8_WS=auto MLIS_BENCH=sd35-large-q4 python bench.py"
run "MLIS_Q8_WS=auto MLIS_BENCH=flux-schnell python bench.py"
echo "=== QUEUE36 DONE ==="
