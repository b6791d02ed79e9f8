#!/usr/bin/env python
"""Hosted-demo style predictor (reference predict.py / cog.yaml packaging):
one image in, panoptic + instance + semantic visualizations out.

Usage: python predict.py --image input.jpg --config-file <yaml> \
    [--weights ckpt.pth] [--output out_prefix]
"""

import argparse
import os

import cv2
import numpy as np


class Predictor:
    """setup()/predict() interface mirroring the reference's cog
    BasePredictor; the forward is demo/predictor.Predictor.forward_raw
    (one shared implementation for every demo pipeline)."""

    def setup(self, config_file, weights="", opts=()):
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "demo"))
        from predictor import Predictor as DemoPredictor

        from mp_former_tpu.config import (add_deeplab_config,
                                          add_maskformer2_config, get_cfg)

        cfg = get_cfg()
        add_deeplab_config(cfg)
        add_maskformer2_config(cfg)
        cfg.merge_from_file(config_file)
        cfg.merge_from_list(list(opts) + ["MODEL.WEIGHTS", weights]
                            if weights else list(opts))
        self.cfg = cfg
        self._p = DemoPredictor(cfg)

    def predict(self, image_bgr: np.ndarray):
        return self._p.forward_raw(image_bgr)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True)
    p.add_argument("--config-file",
                   default="configs/coco/panoptic-segmentation/maskformer2_R50_bs16_50ep.yaml")
    p.add_argument("--weights", default="")
    p.add_argument("--output", default="prediction")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = p.parse_args()

    from demo.demo import overlay_instances, overlay_semantic
    from mp_former_tpu.data.datasets.builtin_meta import coco_panoptic_is_thing
    from mp_former_tpu.engine.eval_loop import (postprocess_instance,
                                                postprocess_panoptic,
                                                postprocess_semantic,
                                                semantic_before_inference)

    pred = Predictor()
    pred.setup(args.config_file, args.weights, args.opts or [])
    img = cv2.imread(args.image)
    h, w = img.shape[:2]
    logits, masks, size = pred.predict(img)
    cfg = pred.cfg
    k = cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES

    scores, classes, bin_masks = postprocess_instance(
        logits, masks, size, h, w, k, cfg.TEST.DETECTIONS_PER_IMAGE)
    cv2.imwrite(f"{args.output}_instance.png",
                overlay_instances(img, scores, classes, bin_masks))

    sem = postprocess_semantic(logits, masks, size, h, w,
                               before_inference=semantic_before_inference(cfg))
    cv2.imwrite(f"{args.output}_semantic.png", overlay_semantic(img, sem))

    is_thing = coco_panoptic_is_thing() if k == 133 else np.ones(k, bool)
    pan_map, segments = postprocess_panoptic(
        logits, masks, size, h, w, k,
        cfg.MODEL.MASK_FORMER.TEST.OBJECT_MASK_THRESHOLD,
        cfg.MODEL.MASK_FORMER.TEST.OVERLAP_THRESHOLD, is_thing)
    rng = np.random.RandomState(11)
    colors = rng.randint(0, 255, (int(pan_map.max()) + 1, 3), np.uint8)
    colors[0] = 0
    cv2.imwrite(f"{args.output}_panoptic.png",
                (0.5 * img + 0.5 * colors[pan_map][:, :, ::-1]).astype(np.uint8))
    print(f"wrote {args.output}_{{instance,semantic,panoptic}}.png "
          f"({len(segments)} panoptic segments)")


if __name__ == "__main__":
    main()
