#!/bin/bash
# Final round-2 measurement pass: decode isolation + all-config e2e bench.
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ==="
  eval "${*/python/timeout 1500 python}" 2>&1 \
    | grep -E "RESULT|compile|rror|xcept|GiB|metric|run "
}

run "MLIS_DECODE=vae python tools/decode_bench.py 10"
run "MLIS_DECODE=vaexl python tools/decode_bench.py 6"
run "MLIS_BENCH=sd15,sdxl,sd21,sd15-tae,sd15-i2i,sd15-b8 python bench.py"
