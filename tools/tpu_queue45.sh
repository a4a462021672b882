#!/bin/bash
# Round-5 FINAL sweep (#45): every bench config under shipped defaults.
# Runs AFTER queues 41/42/43/46 and their default decisions (int8ws
# stays auto, unet-stock stays off, stock block heuristic confirmed) —
# no env overrides here, shipped defaults only: this table IS the
# round-5 record.  Ordered so the configs whose defaults CHANGED this
# round (int8ws candidacy on the DiT families) record first; stable
# warm rows follow.  Rows already recorded this session are not re-run
# (queue 41: sd15/sdxl/sd15-pag/sd15-unipc/sdxl-lowmem; queue 43:
# sd35-large-dc).
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

# --- int8ws-affected DiT flagships first (the round's changed defaults)
run "MLIS_BENCH=sd35-large python bench.py"
run "MLIS_BENCH=flux-schnell python bench.py"
run "MLIS_BENCH=flux-dev python bench.py"
run "MLIS_BENCH=sd3,sd3-turbo python bench.py"
run "MLIS_BENCH=sd35-large-q4 python bench.py"
# --- int8ws=off anchors (isolate the candidacy's e2e contribution)
run "MLIS_Q8_INT8WS=off MLIS_BENCH=sd35-large python bench.py"
run "MLIS_Q8_INT8WS=off MLIS_BENCH=flux-schnell python bench.py"
# --- remaining DiT families
run "MLIS_BENCH=sd3-t5 python bench.py"
run "MLIS_BENCH=sd3-dc python bench.py"
run "MLIS_BENCH=sd35-medium,sd35-medium-slg python bench.py"
run "MLIS_BENCH=sd35-medium-dc python bench.py"
run "MLIS_BENCH=flux-schnell-dc python bench.py"
run "MLIS_FLUX_Q4=1 MLIS_BENCH=flux-schnell python bench.py"
run "MLIS_BENCH=flux-dev-dc python bench.py"
# --- BASELINE + UNet configs (warm from queues 41/42)
run "MLIS_BENCH=sd15-tae,sd21,sd15-i2i python bench.py"
run "MLIS_BENCH=sd15-b8,sd15-cnet,sd15-hires python bench.py"
run "MLIS_BENCH=sd15-dc,sdxl-dc python bench.py"
run "MLIS_BENCH=sd15-lcm python bench.py"
run "MLIS_BENCH=sd15-q4 python bench.py"
run "MLIS_BENCH=sdxl-q8 python bench.py"
run "MLIS_BENCH=sdxl-refiner python bench.py"
run "MLIS_BENCH=sdxl-ens python bench.py"
# --- upscaler
run "MLIS_BENCH=esrgan-x4 python bench.py"
echo "=== QUEUE45 DONE ==="
