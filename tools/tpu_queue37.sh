#!/bin/bash
# Round-4 FINAL sweep (#37): every bench config under shipped defaults.
# This is the round-record table — it runs AFTER the MLIS_Q8_WS=auto
# default flip (queue-36 decision), so the *-q8/-q4/int8-DiT configs
# recompile with the weight-stationary grid and everything else re-runs
# warm.  No env overrides: shipped defaults only.
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

# BASELINE configs (warm, unaffected by the ws flip)
run "MLIS_BENCH=sd15,sd15-tae,sd21,sdxl,sd15-i2i python bench.py"
run "MLIS_BENCH=sd15-b8,sd15-cnet,sd15-hires python bench.py"
run "MLIS_BENCH=sd15-dc,sdxl-dc python bench.py"
# quantized UNet configs: ws gate newly reachable (m>=2048 at 512/1024px)
run "MLIS_BENCH=sd15-q4 python bench.py"
run "MLIS_BENCH=sdxl-q8 python bench.py"
# beyond-reference SDXL pipelines (warm)
run "MLIS_BENCH=sdxl-refiner python bench.py"
run "MLIS_BENCH=sdxl-ens python bench.py"
# DiT families (bf16 sd3 warm; int8/int4 ones recompile with ws)
run "MLIS_BENCH=sd3,sd3-turbo python bench.py"
run "MLIS_BENCH=sd3-t5 python bench.py"
run "MLIS_BENCH=sd3-dc python bench.py"
run "MLIS_BENCH=sd35-medium,sd35-medium-slg python bench.py"
run "MLIS_BENCH=sd35-medium-dc python bench.py"
run "MLIS_BENCH=sd35-large python bench.py"
run "MLIS_BENCH=sd35-large-q4 python bench.py"
run "MLIS_BENCH=flux-schnell python bench.py"
run "MLIS_FLUX_Q4=1 MLIS_BENCH=flux-schnell python bench.py"
run "MLIS_BENCH=flux-schnell-dc python bench.py"
run "MLIS_BENCH=flux-dev python bench.py"
run "MLIS_BENCH=flux-dev-dc python bench.py"
# upscaler
run "MLIS_BENCH=esrgan-x4 python bench.py"
echo "=== QUEUE37 DONE ==="
