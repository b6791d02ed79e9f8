#!/usr/bin/env bash
# Bisect the runtime-client single-program size boundary (VERDICT round-4 #4).
#
# PERFORMANCE.md round 4: a MONOLITHIC train step at B=8@512 re-executes for
# thousands of steps, while every bs16@1024 layout dies on its 2nd execution
# of any large program. Nothing between was probed as ONE program. This
# driver runs the intermediate monolithic shapes serially (each in its own
# process — a client abort kills the process), 8 synced iterations each:
#
#   B=16 @ 512   (the released batch at half resolution)
#   B=12 @ 512
#   B=8  @ 640
#   B=8  @ 768
#   B=2  @ 1024  (the accum-8 micro shape as a plain monolithic step —
#                 isolates image size from program structure)
#
# TPU-optimized training profile (bf16, headshare, grid loss, gt-stride 4,
# uint8 transfer) = the same family as the healthy B=8@512 baseline row.
#
# Usage: tools/bisect_program_size.sh [outdir]
set -uo pipefail
cd "$(dirname "$0")/.."

OUT="${1:-/tmp/bisect_probe}"
mkdir -p "$OUT"

run_probe() {
  local tag="$1" batch="$2" size="$3"
  echo "=== probe $tag (B=$batch @ ${size}px, monolithic, 8 iters)"
  timeout 2400 python tools/probe_bs16_client.py \
    --iters 8 --batch "$batch" --size "$size" --gt-stride 4 --uint8 \
    TPU.COMPUTE_DTYPE bfloat16 \
    TPU.SAMPLING_ENGINE headshare \
    TPU.PALLAS_TAP_WEIGHTING True \
    TPU.GT_MASK_STRIDE 4 \
    TPU.GRAD_ACCUM_STEPS 1 \
    2>&1 | tee "$OUT/$tag.log" | grep -E "iter |steps completed|post-check"
}

run_probe b16_512  16 512
run_probe b12_512  12 512
run_probe b8_640    8 640
run_probe b8_768    8 768
run_probe b2_1024   2 1024

echo "=== summary"
for f in "$OUT"/*.log; do
  echo "$f: $(grep -o '[0-9]*/8 steps completed' "$f" | tail -1)"
done
