#!/bin/bash
# Round-5 pass #40: per-shape int8-MXU candidacy (MLIS_Q8_INT8WS) A/B +
# ws bimodality probe.
#  1. Full 7-shape kernel table with 5-run min/med/max (new harness) —
#     includes the shipping-dispatch rows (q8-dot / q8-dot-percol).
#  2. Fresh-compile variance probe at the two unstable mlp-dn shapes
#     (ws@flux-dn measured 3.54/7.20/9.91 ms across queues 36/38/39).
#  3. ws geometry sweep at flux-dn (planner v1 vs v2 picked different
#     (bm, bn); attribute how much of the bimodality is geometry).
#  4. sd35-large step + e2e, flux-schnell/dev e2e, sd3 e2e under the new
#     int8ws=auto default, plus int8ws=off regression anchors.
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ==="
  for attempt in 1 2 3; do
    out=$(eval "${*/python/timeout 3000 python}" 2>&1)
    echo "$out" | grep -E "RESULT|PASS|FAIL|OK|compile|rror|xcept|GiB|metric|run |diff|finite|synth|percol|per-column"
    if ! echo "$out" | grep -q "Unable to initialize backend"; then
      return
    fi
    echo "--- backend unavailable (attempt $attempt), retrying in 120s"
    sleep 120
  done
}

# 1. full kernel table, 5 timed runs per entry (compile cache on)
run "python tools/q8_ws_ab.py"
# 2. fresh-compile probe at the dn shapes (cache off, 4 compiles each)
run "MLIS_WS_FILTER=dn MLIS_WS_COMPILES=4 python tools/q8_ws_ab.py"
# 3. geometry sweep at flux-dn: planner-v2 pick vs narrow/wide stripes
run "MLIS_WS_FILTER=flux-mlp-dn MLIS_WS_GEOM=256:128,256:256,512:128,128:512 python tools/q8_ws_ab.py"
# 4. step + e2e under the shipped defaults (int8ws auto)
run "MLIS_STEP_MODEL=sd35-large python tools/step_bench.py"
run "MLIS_BENCH=sd35-large python bench.py"
run "MLIS_BENCH=flux-schnell python bench.py"
run "MLIS_BENCH=flux-dev python bench.py"
run "MLIS_BENCH=sd3 python bench.py"
# 5. int8ws=off anchors (isolate the candidacy's e2e contribution)
run "MLIS_Q8_INT8WS=off MLIS_BENCH=sd35-large python bench.py"
run "MLIS_Q8_INT8WS=off MLIS_BENCH=flux-schnell python bench.py"
echo "=== QUEUE40 DONE ==="
