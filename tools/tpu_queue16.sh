#!/bin/bash
# Round-3 pass #16: int4 weight-only tier on hardware.
#  1) q4 Pallas kernel numerics on device at flux/sd35 shapes;
#  2) sd15-q4 e2e (dequant-overhead cost on a small model);
#  3) sd35-large int4 e2e (8B at ~3.1 GiB weights);
#  4) flux-schnell int4 e2e (12B at ~6.2 GiB resident — headroom vs
#     the 11.75 GiB int8 run of queue10).
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ==="
  for attempt in 1 2 3; do
    out=$(eval "${*/python/timeout 2400 python}" 2>&1)
    echo "$out" | grep -E "RESULT|PASS|FAIL|OK|compile|rror|xcept|GiB|metric|run |diff|finite|synthes"
    if ! echo "$out" | grep -q "Unable to initialize backend"; then
      return
    fi
    echo "--- backend unavailable (attempt $attempt), retrying in 120s"
    sleep 120
  done
}

run "python tools/q4_check.py"
run "MLIS_BENCH=sd15-q4 python bench.py"
run "MLIS_BENCH=sd35-large-q4 python bench.py"
run "MLIS_FLUX_Q4=1 MLIS_BENCH=flux-schnell python bench.py"
echo "=== QUEUE16 DONE ==="
