#!/bin/bash
# Round-3 pass #10: SD3 step attribution retries + projection/block A/Bs.
# Baseline (queue11): sd3 step 319.03 ms vs 85.7 ms MXU floor (26% MXU).
# Per-run timeout 1800s: the axon relay occasionally hangs on TCP recv;
# a hung dial must not eat the queue (two queue-11 entries died that way).
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ==="
  eval "${*/python/timeout 1800 python}" 2>&1 \
    | grep -E "RESULT|PASS|FAIL|OK|compile|rror|xcept|GiB|metric|run |diff|finite"
}

run "MLIS_STEP_MODEL=sd3 MLIS_ABLATE=attn python tools/step_bench.py"
run "MLIS_STEP_MODEL=sd3 MLIS_MMDIT_EINSUM=1 python tools/step_bench.py"
run "MLIS_STEP_MODEL=sd3 MLIS_FLASH_BLOCK=1024,1024 python tools/step_bench.py"
run "MLIS_STEP_MODEL=sd3 MLIS_FLASH_BLOCK=2048,512 python tools/step_bench.py"
run "MLIS_STEP_MODEL=sd3 MLIS_FLASH_BLOCK=512,2048 python tools/step_bench.py"
echo "=== QUEUE12 DONE ==="
