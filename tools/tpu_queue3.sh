#!/bin/bash
# Round-3 measurement pass #1: kernel health after the danger-split change,
# mesh-flash smoke, MXU contraction-padding A/B, VAE decode attribution +
# fused-upsample A/B, GN fusion census, SD2.1/SDXL regression check.
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ==="
  eval "${*/python/timeout 2400 python}" 2>&1 \
    | grep -E "RESULT|PASS|FAIL|compile|rror|xcept|GiB|metric|run |census|fusion|diff|finite"
}

# kernel numerics + compile health (twice: the S(1) flake was real)
run "python tools/flash_check.py"
run "python tools/flash_check.py"

# shard_map'ed Pallas flash on real TPU (VERDICT item 6)
run "python tools/mesh_flash_smoke.py"

# is the d->128 QK contraction padding real? (VERDICT item 3)
run "python tools/mxu_contraction_bench.py"

# VAE decode attribution + fused upsample A/B (VERDICT item 2)
run "MLIS_DECODE=vae python tools/decode_bench.py 10"
run "MLIS_DECODE=vae MLIS_ABLATE=gn python tools/decode_bench.py 10"
run "MLIS_DECODE=vae MLIS_ABLATE=gn,attn python tools/decode_bench.py 10"
run "MLIS_DECODE=vae MLIS_FUSED_UPSAMPLE=1 python tools/decode_bench.py 10"
run "MLIS_DECODE=vaexl python tools/decode_bench.py 6"
run "MLIS_DECODE=vaexl MLIS_FUSED_UPSAMPLE=1 python tools/decode_bench.py 6"

# does XLA already fuse the GN statistics with neighbors? (VERDICT item 8)
run "python tools/hlo_fusions.py vae"
run "python tools/hlo_fusions.py sd15"

# step + e2e regression with the deterministic split (items 3/4)
run "MLIS_STEP_MODEL=sd15 python tools/step_bench.py"
run "MLIS_STEP_MODEL=sdxl python tools/step_bench.py"
run "MLIS_BENCH=sd21,sdxl python bench.py"
