#!/bin/bash
# Round-5 pass #42: UNet-regime attention kernel A/B (VERDICT r4 weak #5).
#  1. flash_unet_ab: ours-t vs stock-NATURAL (kernel-only, no relayout —
#     the layout folds into attn_mhead's projection einsums) at the six
#     flash-eligible UNet self-attention shapes, 5-run min/med/max,
#     + on-device stock numerics per shape.
#  2. vmem determinism with the unet-stock route enabled: stock outputs
#     at these shapes sit in the S(1) promotion window; safety rests on
#     the regime-(a) frame model (_stock_frame) — 6 fresh in-scan
#     compiles must be clean before any default flip.
#  3. step-level + e2e A/B under MLIS_FLASH_UNET_STOCK=auto vs shipped.
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ==="
  for attempt in 1 2 3; do
    out=$(eval "${*/python/timeout 3000 python}" 2>&1)
    echo "$out" | grep -E "RESULT|PASS|FAIL|OK|compile |rror|xcept|GiB|metric|run |diff|finite|synth|ms/step|ms/attention"
    if ! echo "$out" | grep -q "Unable to initialize backend"; then
      return
    fi
    echo "--- backend unavailable (attempt $attempt), retrying in 120s"
    sleep 120
  done
}

run "python tools/flash_unet_ab.py"
run "MLIS_VMEM_UNET_STOCK=1 python tools/vmem_determinism.py 6"
run "MLIS_STEP_MODEL=sd15 python tools/step_bench.py"
run "MLIS_FLASH_UNET_STOCK=auto MLIS_STEP_MODEL=sd15 python tools/step_bench.py"
run "MLIS_STEP_MODEL=sdxl python tools/step_bench.py"
run "MLIS_FLASH_UNET_STOCK=auto MLIS_STEP_MODEL=sdxl python tools/step_bench.py"
run "MLIS_FLASH_UNET_STOCK=auto MLIS_BENCH=sd15 python bench.py"
run "MLIS_FLASH_UNET_STOCK=auto MLIS_BENCH=sdxl python bench.py"
run "MLIS_FLASH_UNET_STOCK=auto MLIS_BENCH=sd21 python bench.py"
echo "=== QUEUE42 DONE ==="
