#!/bin/bash
# Evaluate a checkpoint (mirrors reference eval.sh:10-16).
# Usage: ./eval.sh <weights.pth-or-orbax-dir> [extra opts...]
weights=${1:-model_final.pth}
shift || true

python train_net.py \
  --config-file configs/coco/instance-segmentation/maskformer2_R50_bs16_12ep_DN_query.yaml \
  --eval-only \
  MODEL.WEIGHTS "${weights}" \
  MODEL.MASK_FORMER.TRANSFORMER_DECODER_NAME MultiScaleMaskedTransformerDecoderMaskDN \
  "$@"
