#!/bin/bash
# Round-3 measurement pass #3 (relaunch of the queue4 plan after the session
# restart): always-promoted planner determinism proof, previously-OOMing
# sd21 bench, d-padding measurement, decode/step regression under the new
# planner + default fused upsample.
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ==="
  eval "${*/python/timeout 3600 python}" 2>&1 \
    | grep -E "RESULT|PASS|FAIL|OK|compile|rror|xcept|GiB|metric|run |diff|finite"
}

run "python tools/vmem_determinism.py 12"
run "MLIS_BENCH=sd21 python bench.py"
run "python tools/flash_d_bench.py 20"
run "MLIS_DECODE=vae python tools/decode_bench.py 10"
run "MLIS_DECODE=vae MLIS_FLASH_ATTENTION=0 python tools/decode_bench.py 10"
run "MLIS_DECODE=vaexl python tools/decode_bench.py 6"
run "MLIS_STEP_MODEL=sd15 python tools/step_bench.py"
run "MLIS_STEP_MODEL=sdxl python tools/step_bench.py"
run "MLIS_BENCH=sd15,sdxl python bench.py"
echo "=== QUEUE5 DONE ==="
# spatial-batch probe: same pixel count, fatter batch
run "MLIS_DECODE=vae MLIS_DECODE_BATCH=4 MLIS_DECODE_LAT=32 python tools/decode_bench.py 10"
run "MLIS_DECODE=vae MLIS_DECODE_BATCH=16 MLIS_DECODE_LAT=16 python tools/decode_bench.py 10"
run "MLIS_DECODE=vaexl MLIS_DECODE_BATCH=4 MLIS_DECODE_LAT=64 python tools/decode_bench.py 6"
echo "=== QUEUE5+PROBES DONE ==="
