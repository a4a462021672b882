#!/bin/bash
# Round-4 pass #26: flow-model deepcache on hardware.
#   New feature this session: --deepcache on MMDiT (SD3/SD3.5) and Flux
#   (deep-tail residual reuse, models/{mmdit,flux}.py _dc_split).
#   Measure the latency side of the quality/latency trade at interval 3.
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

run "MLIS_BENCH=sd3-dc python bench.py"
run "MLIS_BENCH=sd35-medium-dc python bench.py"
run "MLIS_BENCH=flux-dev-dc python bench.py"
run "MLIS_BENCH=flux-schnell-dc python bench.py"
echo "=== QUEUE26 DONE ==="
