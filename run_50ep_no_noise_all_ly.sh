#!/bin/bash
# Released MP-Former training recipe (mirrors reference
# run_50ep_no_noise_all_ly.sh:9-23): 12-epoch COCO instance, DN 'points'
# mode, scalar 1, no point noise, all-layer mask refresh, label-noise 0.2.
sc=1
ns=0.0
mode=points
all_ly=True
lbns=0.2
name=12eps_sc${sc}_ns${ns}_mode${mode}_ly${all_ly}_lbns${lbns}

python train_net.py \
  --config-file configs/coco/instance-segmentation/maskformer2_R50_bs16_12ep_DN_query.yaml \
  MODEL.DN.NUM_DN ${sc} \
  MODEL.DN.NOISE_SCALE ${ns} \
  MODEL.MASK_FORMER.DN_MODE ${mode} \
  MODEL.MASK_FORMER.ALL_LY_DN ${all_ly} \
  MODEL.MASK_FORMER.LB_NOISE_RATIO ${lbns} \
  MODEL.MASK_FORMER.TRANSFORMER_DECODER_NAME MultiScaleMaskedTransformerDecoderMaskDN \
  OUTPUT_DIR output/${name} \
  "$@"
