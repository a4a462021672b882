#!/bin/bash
# Round-4 pass #39: row-sweep (rs) strategy A/B for the K >> N mlp-down
# regime.  rs = default grid with block_n = N + f32 VMEM accumulator over
# K chunks: x crosses HBM once, weights once per m-block — the cost model
# says it beats weight-stationary at sd35L-dn/out and flux-dn (ws's
# narrow-bn stripes re-stream activations 10-24x there).  Kernel A/B +
# numerics, then e2e with MLIS_Q8_RS=auto; flip the default on data.
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

run "MLIS_WS_FILTER=dn python tools/q8_ws_ab.py"
run "MLIS_WS_FILTER=out python tools/q8_ws_ab.py"
run "MLIS_Q8_RS=auto MLIS_STEP_MODEL=sd35-large python tools/step_bench.py"
run "MLIS_Q8_RS=auto MLIS_BENCH=sd35-large python bench.py"
run "MLIS_Q8_RS=auto MLIS_BENCH=flux-schnell python bench.py"
echo "=== QUEUE39 DONE ==="
