#!/bin/bash
# Round-4 pass #29: rerun after review fixes (honest esrgan finite check; T5 linears through the quantized dispatch).
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

for i in $(seq 1 40); do
  if timeout 300 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; then
    break
  fi
  sleep 420
done

run "MLIS_BENCH=esrgan-x4 python bench.py"
run "MLIS_BENCH=sd3-t5 python bench.py"
echo "=== QUEUE29 DONE ==="
