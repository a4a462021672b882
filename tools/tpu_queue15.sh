#!/bin/bash
# Round-3 pass #13: static-max flash kernel A/B (on-HW numerics first,
# then step timings at the SD1.5 and SD3 shapes, then combined with the
# 4352-aligned block geometry).
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ==="
  for attempt in 1 2 3; do
    out=$(eval "${*/python/timeout 1800 python}" 2>&1)
    echo "$out" | grep -E "RESULT|PASS|FAIL|OK|compile|rror|xcept|GiB|metric|run |diff|finite"
    if ! echo "$out" | grep -q "Unable to initialize backend"; then
      return
    fi
    echo "--- backend unavailable (attempt $attempt), retrying in 120s"
    sleep 120
  done
}

run "MLIS_FLASH_STATICMAX=1 python tools/flash_check.py"
run "MLIS_FLASH_STATICMAX=1 python tools/step_bench.py"
run "MLIS_FLASH_STATICMAX=1 MLIS_STEP_MODEL=sdxl python tools/step_bench.py"
run "MLIS_FLASH_STATICMAX=1 MLIS_STEP_MODEL=sd3 python tools/step_bench.py"
run "MLIS_FLASH_STATICMAX=1 MLIS_STEP_MODEL=sd3 MLIS_FLASH_BLOCK=2176,256 python tools/step_bench.py"
# padding-aware planner (MLIS_FLASH_PADOPT): zero-padding geometry at
# the non-pow2 shapes — SD2-768 L1 currently pads 48% of its logits,
# SD3 23%.  flash_check first (on-HW numerics at the new geometries).
run "MLIS_FLASH_PADOPT=1 python tools/flash_check.py"
run "MLIS_FLASH_PADOPT=1 MLIS_STEP_MODEL=sd21 python tools/step_bench.py"
run "MLIS_FLASH_PADOPT=1 MLIS_STEP_MODEL=sd3 python tools/step_bench.py"
run "MLIS_FLASH_PADOPT=1 MLIS_FLASH_STATICMAX=1 MLIS_STEP_MODEL=sd3 python tools/step_bench.py"
run "MLIS_FLASH_PADOPT=1 python tools/vmem_determinism.py 5"
echo "=== QUEUE15 DONE ==="
