#!/bin/bash
# Round-4 pass #23: stock-flash dispatch adoption gauntlet.
#   1. stock_dispatch_check: on-device numerics at the 3 DiT shapes,
#      in-scan compile determinism (5 fresh children), timing sanity
#   2. step A/Bs: sd3 + flux step with dispatch auto vs MLIS_FLASH_STOCK=0
#   3. e2e: sd3 + sd35-medium + flux-schnell with the new default
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ==="
  for attempt in 1 2 3; do
    out=$(eval "${*/python/timeout 3000 python}" 2>&1)
    echo "$out" | grep -E "RESULT|PASS|FAIL|OK|compile|rror|xcept|GiB|metric|run |diff|finite|synth|eligible"
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
run "MLIS_STEP_MODEL=sd3 python tools/step_bench.py"
run "MLIS_FLASH_STOCK=0 MLIS_STEP_MODEL=sd3 python tools/step_bench.py"
run "MLIS_STEP_MODEL=flux python tools/step_bench.py"
run "MLIS_FLASH_STOCK=0 MLIS_STEP_MODEL=flux python tools/step_bench.py"
run "MLIS_BENCH=sd3 python bench.py"
run "MLIS_BENCH=sd35-medium python bench.py"
run "MLIS_BENCH=flux-schnell python bench.py"
echo "=== QUEUE23 DONE ==="
