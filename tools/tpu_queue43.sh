#!/bin/bash
# Round-5 pass #43: queue-40 follow-ups.
#  1. sd35-large step attribution with the FIXED step_bench (queue-40's
#     step row ran per-block dq: synth lacked percol_m_hint, so the
#     int8ws candidacy never fired there) + attention ablation — the
#     VERDICT r4 item-4 attribution: is the residue dequant or
#     MXU/attention?
#  2. sd35-large-dc: DeepCache on the 8B flagship (never benched; sd3
#     measured 4.25->2.41 at interval 3).
#  3. flux-dev/schnell step under the fixed hint (int8ws on flux shapes).
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ==="
  for attempt in 1 2 3; do
    out=$(eval "${*/python/timeout 3000 python}" 2>&1)
    echo "$out" | grep -E "RESULT|PASS|FAIL|OK|compile|rror|xcept|GiB|metric|run |diff|finite|synth|ms/step"
    if ! echo "$out" | grep -q "Unable to initialize backend"; then
      return
    fi
    echo "--- backend unavailable (attempt $attempt), retrying in 120s"
    sleep 120
  done
}

run "MLIS_STEP_MODEL=sd35-large python tools/step_bench.py"
run "MLIS_ABLATE=attn MLIS_STEP_MODEL=sd35-large python tools/step_bench.py"
run "MLIS_BENCH=sd35-large-dc python bench.py"
run "MLIS_STEP_MODEL=flux python tools/step_bench.py"
echo "=== QUEUE43 DONE ==="
