#!/bin/bash
# Round-3 measurement pass #2: always-promoted planner health + determinism,
# d-padding measurement, VAE-attn XLA-vs-flash A/B, step/e2e regression.
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ==="
  eval "${*/python/timeout 2400 python}" 2>&1 \
    | grep -E "RESULT|PASS|FAIL|OK|compile|rror|xcept|GiB|metric|run |diff|finite"
}

run "python tools/flash_check.py"
run "python tools/flash_check.py"
run "python tools/vmem_determinism.py 12"
run "python tools/flash_d_bench.py 20"
run "python tools/mxu_contraction_bench.py 50"
run "MLIS_DECODE=vae python tools/decode_bench.py 10"
run "MLIS_DECODE=vae MLIS_FLASH_ATTENTION=0 python tools/decode_bench.py 10"
run "MLIS_DECODE=vaexl python tools/decode_bench.py 6"
run "MLIS_STEP_MODEL=sd15 python tools/step_bench.py"
run "MLIS_STEP_MODEL=sdxl python tools/step_bench.py"
run "MLIS_BENCH=sd21,sdxl,sd15 python bench.py"
