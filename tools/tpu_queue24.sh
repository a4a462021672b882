#!/bin/bash
# Round-4 pass #24: FINAL SWEEP under shipped defaults (stock-flash DiT
# dispatch, static-max, MMDiT einsum).  One current number for every
# bench config (VERDICT r3 item 3: "no shipped feature without a
# number").  Grouped into few processes to amortize relay dials; the
# run() wrapper retries relay outages per group.
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ==="
  for attempt in 1 2 3; do
    out=$(eval "${*/python/timeout 7200 python}" 2>&1)
    echo "$out" | grep -E "RESULT|PASS|FAIL|metric|run |GiB|finite|synth|rror|xcept"
    if ! echo "$out" | grep -q "Unable to initialize backend"; then
      return
    fi
    echo "--- backend unavailable (attempt $attempt), retrying in 120s"
    sleep 120
  done
}

echo "$(date +%H:%M) waiting for axon relay..."
for i in $(seq 1 80); do
  if timeout 300 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; then
    echo "$(date +%H:%M) relay healthy (probe $i)"
    break
  fi
  sleep 420
done

run "MLIS_BENCH=sd15,sd15-tae,sd21,sdxl,sd15-i2i python bench.py"
run "MLIS_BENCH=sd15-b8,sd15-cnet,sd15-hires python bench.py"
run "MLIS_BENCH=sd15-dc,sdxl-dc python bench.py"
run "MLIS_BENCH=sd3,sd3-turbo python bench.py"
run "MLIS_BENCH=sd35-medium,sd35-medium-slg python bench.py"
run "MLIS_BENCH=sd35-large python bench.py"
run "MLIS_BENCH=flux-schnell python bench.py"
run "MLIS_BENCH=flux-dev python bench.py"
run "MLIS_BENCH=sd15-q4,sd15-q8 python bench.py"
run "MLIS_BENCH=sdxl-ens python bench.py"
echo "=== QUEUE24 DONE ==="
