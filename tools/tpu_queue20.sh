#!/bin/bash
# Round-4 pass #20: (1) q4 Mosaic-lowering fix validation, (2) SD3
# attention kernel attribution + split-k variants, (3) static-max
# default-flip numerics, (4) split-k at the full SD3 step, (5) int8-MXU
# vs dequant A/B on the linear-dominated DiT (VERDICT r3 item 2),
# (6) first working int4 e2e number.
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ==="
  for attempt in 1 2 3; do
    out=$(eval "${*/python/timeout 2400 python}" 2>&1)
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

run "python tools/q4_check.py"
run "python tools/flash_check.py"
run "python tools/flash_sd3_bench.py"
run "MLIS_STEP_MODEL=sd3 MLIS_FLASH_SPLITK=2 python tools/step_bench.py"
run "MLIS_STEP_MODEL=sd3 MLIS_FLASH_SPLITK=4 python tools/step_bench.py"
run "MLIS_FLASH_SPLITK=2 python tools/flash_check.py"
run "MLIS_FLASH_SPLITK=2 python tools/vmem_determinism.py 3"
run "MLIS_Q8_MODE=dq MLIS_BENCH=sd3-q8 python bench.py"
run "MLIS_Q8_MODE=int8 MLIS_BENCH=sd3-q8 python bench.py"
run "MLIS_BENCH=sd15-q4 python bench.py"
echo "=== QUEUE20 DONE ==="
