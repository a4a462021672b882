#!/bin/bash
# Round-3 pass #7: SD3/MMDiT model family on hardware.
#   1. kernel sanity after the family addition (flash_check).
#   2. sd3 bench (SD3-medium MMDiT 1024px, fused dual-tower encode, 16-ch
#      VAE) — first hardware numbers for the flow family.
#   3. sd3 turbo shape (4-step cfg1: SD3.5-turbo-style inference).
#   4. sd15+sdxl regression sweep (the family addition touched the shared
#      sampler/encode paths: confirm no drift from the queue-8 numbers
#      0.486/2.330 s).
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ==="
  eval "${*/python/timeout 3600 python}" 2>&1 \
    | grep -E "RESULT|PASS|FAIL|OK|compile|rror|xcept|GiB|metric|run |diff|finite|synthesis"
}

run "python tools/flash_check.py"
run "MLIS_BENCH=sd3 python bench.py"
run "MLIS_BENCH=sd3-turbo python bench.py"
run "MLIS_BENCH=sd15,sdxl python bench.py"
echo "=== QUEUE9 DONE ==="
