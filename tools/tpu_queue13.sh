#!/bin/bash
# Round-3 pass #11: SD3 step attribution (entries lost in queue12 to tunnel
# contention) + padding-aligned flash block geometries.
#
# SD3 joint attention is S=4250 (4096 img + 154 txt): the default planner
# choice (bq=512, bk=1024) pads q->4608 and k->5120 = 23% of all logits are
# padding waste, and attention is ~31% of the step FLOPs.  4352 = 2^8*17, so
# bk=256 and bq in {256,544,1088,2176} hit sq_p=sk_p=4352 (4.9% waste).
#
# run() retries on the axon relay's transient "Unable to initialize backend"
# (killed two queue-12 entries); per-run timeout bounds the TCP-recv hang.
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ==="
  for attempt in 1 2 3; do
    out=$(eval "${*/python/timeout 1800 python}" 2>&1)
    echo "$out" | grep -E "RESULT|PASS|FAIL|OK|compile|rror|xcept|GiB|metric|run |diff|finite|ablate"
    if ! echo "$out" | grep -q "Unable to initialize backend"; then
      return
    fi
    echo "--- backend unavailable (attempt $attempt), retrying in 120s"
    sleep 120
  done
}

run "MLIS_STEP_MODEL=sd3 MLIS_ABLATE=attn python tools/step_bench.py"
run "MLIS_STEP_MODEL=sd3 MLIS_FLASH_BLOCK=1088,256 python tools/step_bench.py"
run "MLIS_STEP_MODEL=sd3 MLIS_FLASH_BLOCK=2176,256 python tools/step_bench.py"
run "MLIS_STEP_MODEL=sd3 MLIS_FLASH_BLOCK=256,256 python tools/step_bench.py"
run "MLIS_STEP_MODEL=sd3 MLIS_MMDIT_EINSUM=1 python tools/step_bench.py"
echo "=== QUEUE13 DONE ==="
