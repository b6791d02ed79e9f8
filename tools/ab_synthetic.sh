#!/usr/bin/env bash
# Trained A/B harness for the TPU-native deviations (VERDICT round-2 #2).
#
# Every arm trains tools/ab_base_synthetic.yaml (the frozen round-2
# AP-39.1 synthetic-COCO setup: packed2x2 + grid points, B=8, 512px LSJ,
# bf16, 3000 iters) changing exactly ONE knob, then evals the final
# checkpoint with the shared eval settings, so final-AP deltas isolate:
#
#   grid_baseline  packed2x2 + grid        (== the round-2 run; re-usable)
#   ref_random     packed2x2 + RANDOM continuous point sampling
#                  (reference-exact loss: criterion.py:162-187 semantics)
#   tpu_headshare  HEADSHARE + grid        (the TPU-optimized engine; a
#                  trained-from-scratch deviation — measures its AP cost)
#   scipy_matcher  packed2x2 + grid + TPU.MATCHER_HOST_EXACT (exact scipy
#                  Hungarian via the two-phase host hop vs the on-device
#                  auction default — bounds the auction's 1-5%
#                  cost-suboptimality AP effect; axon rejects in-jit host
#                  callbacks, so MPFORMER_LSA=scipy cannot run on the TPU)
#
# Usage: DETECTRON2_DATASETS=/tmp/synth tools/ab_synthetic.sh <arm> [outdir]
# One arm at a time — never run two TPU processes at once.
set -euo pipefail
cd "$(dirname "$0")/.."

ARM="${1:?arm: ref_random | tpu_headshare | scipy_matcher | grid_baseline}"
OUT="${2:-/tmp/ab_${ARM}}"

OVERRIDES=()
case "$ARM" in
  grid_baseline) ;;
  ref_random)    OVERRIDES+=(TPU.POINT_SAMPLE_MODE random) ;;
  tpu_headshare) OVERRIDES+=(TPU.SAMPLING_ENGINE headshare
                             TPU.PALLAS_TAP_WEIGHTING True) ;;
  scipy_matcher) OVERRIDES+=(TPU.MATCHER_HOST_EXACT True) ;;
  *) echo "unknown arm $ARM" >&2; exit 2 ;;
esac

echo "=== arm $ARM: train -> $OUT"
python train_net.py --config-file tools/ab_base_synthetic.yaml \
  OUTPUT_DIR "$OUT" "${OVERRIDES[@]+"${OVERRIDES[@]}"}"

echo "=== arm $ARM: eval final checkpoint"
python train_net.py --config-file tools/ab_base_synthetic.yaml --eval-only \
  MODEL.WEIGHTS "$OUT/checkpoints/3000" \
  MODEL.MASK_FORMER.TEST.INSTANCE_ON True \
  MODEL.MASK_FORMER.TEST.SEMANTIC_ON False \
  MODEL.MASK_FORMER.TEST.OBJECT_MASK_THRESHOLD 0.8 \
  MODEL.MASK_FORMER.TEST.OVERLAP_THRESHOLD 0.8 \
  INPUT.MIN_SIZE_TEST 512 INPUT.MAX_SIZE_TEST 512 \
  TEST.DETECTIONS_PER_IMAGE 100 TPU.MAX_INSTANCES 100 \
  OUTPUT_DIR "$OUT/eval" "${OVERRIDES[@]+"${OVERRIDES[@]}"}" \
  2>&1 | tee "$OUT/eval.log"
