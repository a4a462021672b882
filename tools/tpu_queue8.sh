#!/bin/bash
# Round-3 pass #6: validate planner v3.2 (f32-output regime (c) reverted —
# falsified on HW: f32 pallas outputs are S(1)-placed even standalone and
# even above 16MiB; replaced by regime (d): drop the MXU-sum ones row so
# dv shrinks 80->64 and SD2-L0/SDXL-L1 reach the stack+output<=budget
# regime with NO q padding) — kernel numerics, scanned-compile
# determinism, the sd21 bench, step regressions, the full five-config
# sweep, and the ControlNet config.
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ==="
  eval "${*/python/timeout 3600 python}" 2>&1 \
    | grep -E "RESULT|PASS|FAIL|OK|compile|rror|xcept|GiB|metric|run |diff|finite"
}

run "python tools/flash_check.py"
run "python tools/vmem_determinism.py 10"
run "MLIS_BENCH=sd21 python bench.py"
run "MLIS_STEP_MODEL=sd15 python tools/step_bench.py"
run "MLIS_STEP_MODEL=sdxl python tools/step_bench.py"
run "MLIS_DECODE=vae python tools/decode_bench.py 10"
run "MLIS_BENCH=sd15,sdxl,sd15-tae,sd15-b8,sd15-i2i python bench.py"
run "MLIS_BENCH=sd15-cnet python bench.py"
echo "=== QUEUE8 DONE ==="
