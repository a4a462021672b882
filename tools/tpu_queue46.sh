#!/bin/bash
# Round-5 pass #46: stock-flash block-geometry sweep at the four DiT
# attention shapes (the queue-23 adoption ran the heuristic geometry
# only; queue-21/22 proved grid/block structure is what separates
# kernels in this regime).  One entry per shape, each under its own
# timeout.  A win here updates stock_flash's block heuristic BEFORE the
# queue-45 final sweep.
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ==="
  for attempt in 1 2 3; do
    out=$(eval "${*/python/timeout 3000 python}" 2>&1)
    echo "$out" | grep -E "RESULT|PASS|FAIL|OK|compile|rror|xcept|GiB|metric|run |diff|finite|---"
    if ! echo "$out" | grep -q "Unable to initialize backend"; then
      return
    fi
    echo "--- backend unavailable (attempt $attempt), retrying in 120s"
    sleep 120
  done
}

run "MLIS_SWEEP_SHAPE=sd3-joint python tools/stock_block_sweep.py"
run "MLIS_SWEEP_SHAPE=sd35m-dual python tools/stock_block_sweep.py"
run "MLIS_SWEEP_SHAPE=sd35L-joint python tools/stock_block_sweep.py"
run "MLIS_SWEEP_SHAPE=flux-1024 python tools/stock_block_sweep.py"
echo "=== QUEUE46 DONE ==="
