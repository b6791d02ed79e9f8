#!/usr/bin/env python
"""Boundary AP evaluation (reference tools/evaluate_coco_boundary_ap.py via
boundary_iou_api; here self-contained).

Boundary IoU (Cheng et al.): IoU of the masks' boundary regions, where the
boundary region = pixels within d = 0.02 * image diagonal of the mask
contour. Plugs into the numpy COCOeval by replacing mask IoU.

Usage: python tools/evaluate_coco_boundary_ap.py --gt-json instances_val2017.json \
  --dt-json coco_instances_results.json --image-root val2017
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2
import numpy as np


def mask_to_boundary(mask: np.ndarray, dilation_ratio: float = 0.02) -> np.ndarray:
    """Boundary region of a binary mask (boundary_iou_api algorithm:
    erode by d and XOR with the original)."""
    h, w = mask.shape
    d = int(round(dilation_ratio * np.sqrt(h * h + w * w)))
    if d < 1:
        d = 1
    pad = np.pad(mask.astype(np.uint8), 1)
    kernel = np.ones((3, 3), np.uint8)
    eroded = cv2.erode(pad, kernel, iterations=d)[1:-1, 1:-1]
    return mask.astype(bool) & ~eroded.astype(bool)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gt-json", required=True)
    p.add_argument("--dt-json", required=True)
    p.add_argument("--max-images", type=int, default=None)
    args = p.parse_args()

    from mp_former_tpu.data.transforms import polygons_to_bitmask
    from mp_former_tpu.evaluation.coco_eval import CocoAPEvaluator

    with open(args.gt_json) as f:
        gt = json.load(f)
    with open(args.dt_json) as f:
        dts = json.load(f)

    cats = sorted(gt["categories"], key=lambda c: c["id"])
    id_map = {c["id"]: i for i, c in enumerate(cats)}
    imgs = {i["id"]: i for i in gt["images"]}
    gt_by_img, dt_by_img = {}, {}
    for a in gt["annotations"]:
        gt_by_img.setdefault(a["image_id"], []).append(a)
    for d in dts:
        dt_by_img.setdefault(d["image_id"], []).append(d)

    def to_mask(seg, h, w):
        if isinstance(seg, list):
            return polygons_to_bitmask([np.asarray(p) for p in seg], h, w)
        if isinstance(seg, dict) and isinstance(seg.get("counts"), list):
            mh, mw = seg["size"]
            flat = np.zeros(mh * mw, np.uint8)
            pos, val = 0, 0
            for c in seg["counts"]:
                flat[pos:pos + c] = val
                pos += c
                val = 1 - val
            return flat.reshape(mw, mh).T.astype(bool)
        raise ValueError("compressed RLE needs the native codec")

    ev = CocoAPEvaluator("segm")
    n = 0
    for img_id, meta in imgs.items():
        if args.max_images and n >= args.max_images:
            break
        h, w = meta["height"], meta["width"]
        g = gt_by_img.get(img_id, [])
        d = dt_by_img.get(img_id, [])
        if not g and not d:
            continue
        ev.add_image(
            det_scores=np.asarray([x["score"] for x in d], np.float64),
            det_cats=np.asarray([id_map[x["category_id"]] for x in d]),
            det_masks_or_boxes=[
                mask_to_boundary(to_mask(x["segmentation"], h, w)) for x in d],
            gt_cats=np.asarray([id_map[x["category_id"]] for x in g]),
            gt_masks_or_boxes=[
                mask_to_boundary(to_mask(x["segmentation"], h, w)) for x in g],
            gt_iscrowd=np.asarray([x.get("iscrowd", 0) for x in g], bool),
        )
        n += 1
    print(json.dumps({"boundary_" + k: v for k, v in ev.summarize().items()}))


if __name__ == "__main__":
    main()
