#!/bin/bash
# Round-5 master chain.  Stage 1: queue 40 (int8ws candidacy A/B + ws
# bimodality probe).  Later stages (lowmem / guidance legs / final
# sweep) are appended as their configs land — each `bash
# tools/tpu_master5.sh queueNN` invocation probes the relay then runs
# one queue, so the chain can be extended without killing a run.
#
# Probe fixes (ADVICE round 4): exit-code based (the axon plugin's
# failure text contains 'TPU', so grepping combined output declared
# outages 'up'), and the budget covers the observed 1.5-2h+ outages
# (~9h: 80 x 420s when dials fail fast).
set -u
cd "$(dirname "$0")/.."

probe() {
  for i in $(seq 1 80); do
    if timeout 300 python -c "import jax; d = jax.devices(); assert d and d[0].platform == 'tpu'" >/dev/null 2>&1; then
      echo "--- relay up (probe $i)"
      return 0
    fi
    echo "--- relay down (probe $i), sleeping 420s"
    sleep 420
  done
  return 1
}

probe || { echo "RELAY NEVER CAME UP"; exit 1; }
for q in "$@"; do
  bash "tools/tpu_${q}.sh"
done
echo "=== MASTER5 DONE ($*) ==="
