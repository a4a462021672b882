#!/bin/bash
# Round-3 pass #18: two-pass highres-fix shape on hardware (sd15-hires:
# base 512 loop -> latent 2x -> refine loop + decode at 1024).
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

run "MLIS_BENCH=sd15-hires python bench.py"
echo "=== QUEUE18 DONE ==="
