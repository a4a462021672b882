#!/bin/bash
# Batched TPU experiments (one at a time through the tunnel).
# Usage: bash tools/tpu_queue.sh  — edit the list below per session.
set -u
cd "$(dirname "$0")/.."

run() {
  # NOTE: env assignments must precede `timeout`, so inject it before the
  # first occurrence of `python` in the command string.
  echo "=== $* ==="
  eval "${*/python/timeout 1500 python}" 2>&1 \
    | grep -E "RESULT|compile|rror|xcept|GiB|metric"
}

# 1) GroupNorm attribution with single-pass statistics
run "MLIS_FLASH_T=1 MLIS_STEP_MODEL=sdxl python tools/step_bench.py 10"
run "MLIS_FLASH_T=1 MLIS_ABLATE=gn MLIS_STEP_MODEL=sdxl python tools/step_bench.py 10"

# 2) SDXL flash-T block tuning (seqs 4096/1024, d=64)
for blk in "512,2048" "2048,2048" "1024,4096" "2048,1024"; do
  run "MLIS_FLASH_T=1 MLIS_FLASH_BLOCK=$blk MLIS_STEP_MODEL=sdxl python tools/step_bench.py 10"
done

# 3) SD1.5 flash-T block check at the winner candidates
for blk in "2048,2048" "1024,4096"; do
  run "MLIS_FLASH_T=1 MLIS_FLASH_BLOCK=$blk MLIS_STEP_MODEL=sd15 python tools/step_bench.py 10"
done
