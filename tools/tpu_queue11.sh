#!/bin/bash
# Round-3 pass #9: SD3 step attribution.  hlo_breakdown (host) says the
# CFG step is 16.9 TFLOP => 85.7 ms MXU floor; e2e gives ~330 ms/step
# (~26% MXU vs SDXL's 65%).  Attribute: scanned raw step, attention
# ablated, and the flash-vs-default block sensitivity at the 4250-seq
# joint-attention shape.
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ==="
  eval "${*/python/timeout 3600 python}" 2>&1 \
    | grep -E "RESULT|PASS|FAIL|OK|compile|rror|xcept|GiB|metric|run |diff|finite"
}

run "MLIS_STEP_MODEL=sd3 python tools/step_bench.py"
run "MLIS_STEP_MODEL=sd3 MLIS_ABLATE=attn python tools/step_bench.py"
run "MLIS_STEP_MODEL=sd3 MLIS_FLASH_T=0 python tools/step_bench.py"
# block-geometry sensitivity at the 4250-seq shape (bigger tiles = fewer
# online-softmax boundary corrections per element, deeper MXU runs)
run "MLIS_STEP_MODEL=sd3 MLIS_FLASH_BLOCK=1024,512 python tools/step_bench.py"
run "MLIS_STEP_MODEL=sd3 MLIS_FLASH_BLOCK=512,1024 python tools/step_bench.py"
run "MLIS_STEP_MODEL=sd3 MLIS_FLASH_BLOCK=1024,1024 python tools/step_bench.py"
echo "=== QUEUE11 DONE ==="
