#!/bin/bash
# Round-4 session-4 master chain: probe the relay, then queues 38 -> 39 -> 37.
# 38/39 are kernel A/Bs (ws planner v2, row-sweep dq); 37 is the round-4
# FINAL sweep and runs last so any default flip decided on 38/39 data is
# picked up (each bench.py entry is a fresh process reading current code).
set -u
cd "$(dirname "$0")/.."

probe() {
  for i in $(seq 1 60); do
    if timeout 300 python -c "import jax; print(jax.devices())" 2>&1 | grep -q TPU; then
      echo "--- relay up (probe $i)"
      return 0
    fi
    echo "--- relay down (probe $i), sleeping 60s"
    sleep 60
  done
  return 1
}

probe || { echo "RELAY NEVER CAME UP"; exit 1; }
bash tools/tpu_queue38.sh
bash tools/tpu_queue39.sh
bash tools/tpu_queue37.sh
echo "=== MASTER4 DONE ==="
