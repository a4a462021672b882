#!/bin/bash
# Round-4 pass #25: follow-ups after the final sweep.
#   1. flux step A/B (step_bench flux mode fixed — packed-channel bug)
#   2. attention_t big-shape stock A/B (would stock + 2 relayouts beat
#      ours-t at sdxl-b8/sd15-b8/vae-b8 shapes?) + d=512 numerics
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

echo "$(date +%H:%M) waiting for axon relay..."
for i in $(seq 1 80); do
  if timeout 300 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; then
    echo "$(date +%H:%M) relay healthy (probe $i)"
    break
  fi
  sleep 420
done

run "python tools/stock_dispatch_check.py 5"
run "python tools/flash_stock_ab.py"
run "MLIS_BENCH=sd3-turbo python bench.py"
run "MLIS_STEP_MODEL=flux python tools/step_bench.py"
run "MLIS_FLASH_STOCK=0 MLIS_STEP_MODEL=flux python tools/step_bench.py"
run "python tools/flash_t_stock_ab.py"
run "python tools/mesh_flash_smoke.py"
run "MLIS_BENCH=sd3-q8 python bench.py"
run "MLIS_BENCH=sdxl-q8 python bench.py"
run "MLIS_BENCH=sd35-large-q4 python bench.py"
run "MLIS_FLUX_Q4=1 MLIS_BENCH=flux-schnell python bench.py"
echo "=== QUEUE25 DONE ==="
