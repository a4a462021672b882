#!/bin/bash
# Round-4 pass #35: splash-attention A/B at the DiT shapes (vs the
# shipped stock-flash dispatch), split per shape so each entry's compile
# mass fits the 3000s cap, + sd35-large post-kernel-fix step
# re-attribution (queue 32's attn ablate predates the single-K-block
# dequant fix).
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

run "MLIS_SPLASH_FILTER=sd3-joint python tools/flash_splash_ab.py"
run "MLIS_SPLASH_FILTER=sd35m-dual python tools/flash_splash_ab.py"
run "MLIS_SPLASH_FILTER=flux-1024 python tools/flash_splash_ab.py"
run "MLIS_ABLATE=attn MLIS_STEP_MODEL=sd35-large python tools/step_bench.py"
echo "=== QUEUE35 DONE ==="
