#!/bin/bash
# Round-3 pass #8: Flux.1 on hardware — the 12B DiT int8-quantized on one
# v5e (schnell 4-step distilled, dev 20-step embedded guidance).  First
# hardware numbers for the flux family; watch the compiled-loop memory
# lines (the int8 weights + activations must fit 16 GiB).
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ==="
  eval "${*/python/timeout 3600 python}" 2>&1 \
    | grep -E "RESULT|PASS|FAIL|OK|compile|rror|xcept|GiB|metric|run |diff|finite|synthesis|emory"
}

run "MLIS_BENCH=flux-schnell python bench.py"
run "MLIS_BENCH=flux-dev python bench.py"
echo "=== QUEUE10 DONE ==="
