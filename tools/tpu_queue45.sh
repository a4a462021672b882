#!/bin/bash
# Round-5 FINAL sweep (#45): every bench config under shipped defaults.
# Runs AFTER queues 44/41/42/43 and after any default flips they decide
# (int8ws candidacy e2e, MLIS_FLASH_UNET_STOCK) — no env overrides here,
# shipped defaults only, so this table IS the round-5 record.
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ==="
  for attempt in 1 2 3; do
    out=$(eval "${*/python/timeout 3000 python}" 2>&1)
    echo "$out" | grep -E "RESULT|PASS|FAIL|OK|compile|rror|xcept|GiB|metric|run |diff|finite|synth|peak"
    if ! echo "$out" | grep -q "Unable to initialize backend"; then
      return
    fi
    echo "--- backend unavailable (attempt $attempt), retrying in 120s"
    sleep 120
  done
}

# BASELINE configs (sd15/sdxl/sd15-pag/sd15-unipc/sdxl-lowmem already
# recorded this session by queue 41 — not re-run)
run "MLIS_BENCH=sd15-tae,sd21,sd15-i2i python bench.py"
run "MLIS_BENCH=sd15-b8,sd15-cnet,sd15-hires python bench.py"
run "MLIS_BENCH=sd15-dc,sdxl-dc python bench.py"
# solver cost anchor (first hardware number)
run "MLIS_BENCH=sd15-lcm python bench.py"
# quantized UNet configs
run "MLIS_BENCH=sd15-q4 python bench.py"
run "MLIS_BENCH=sdxl-q8 python bench.py"
# beyond-reference SDXL pipelines
run "MLIS_BENCH=sdxl-refiner python bench.py"
run "MLIS_BENCH=sdxl-ens python bench.py"
# DiT families
run "MLIS_BENCH=sd3,sd3-turbo python bench.py"
run "MLIS_BENCH=sd3-t5 python bench.py"
run "MLIS_BENCH=sd3-dc python bench.py"
run "MLIS_BENCH=sd35-medium,sd35-medium-slg python bench.py"
run "MLIS_BENCH=sd35-medium-dc python bench.py"
run "MLIS_BENCH=sd35-large python bench.py"
run "MLIS_BENCH=sd35-large-q4 python bench.py"
# (sd35-large-dc recorded by queue 43 this session)
run "MLIS_BENCH=flux-schnell python bench.py"
run "MLIS_FLUX_Q4=1 MLIS_BENCH=flux-schnell python bench.py"
run "MLIS_BENCH=flux-schnell-dc python bench.py"
run "MLIS_BENCH=flux-dev python bench.py"
run "MLIS_BENCH=flux-dev-dc python bench.py"
# upscaler
run "MLIS_BENCH=esrgan-x4 python bench.py"
echo "=== QUEUE45 DONE ==="
