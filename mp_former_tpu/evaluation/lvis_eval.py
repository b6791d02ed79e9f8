"""LVIS evaluator (reference dispatches evaluator_type 'lvis' to d2's
LVISEvaluator, train_net.py:214-215, which wraps the official lvis-api).

LVIS differs from COCO evaluation in three ways, all implemented here on top
of the numpy COCOeval core (coco_eval.py):

1. **Federated evaluation**: each image only judges the categories it was
   annotated for — a category's detections on an image count only if the
   category is in the image's positive set (has GT) or its
   `neg_category_ids` (verified absent). Everything else is ignored, not FP.
2. **Not-exhaustive images**: for categories in an image's
   `not_exhaustive_category_ids`, unmatched detections are ignored (the
   annotators did not mark every instance, so a miss is not a FP).
3. **maxDets = 300 per image across categories** (COCO caps 100 per
   category), and AP is additionally broken down by category frequency:
   APr (rare, 1-10 training images), APc (common, 11-100), APf (frequent).
"""

from __future__ import annotations

import json
from typing import Dict, List

import numpy as np

from .coco_eval import CocoAPEvaluator


class LVISEvaluator:
    """Same process() surface as COCOEvaluator (evaluators.py); needs the
    LVIS json for per-image neg/not-exhaustive sets and category frequency."""

    def __init__(self, dataset_records: List[dict], json_file: str,
                 iou_type: str = "segm", max_dets: int = 300):
        self._gt_by_id = {r["image_id"]: r for r in dataset_records}
        self.iou_type = iou_type
        self.max_dets = max_dets
        with open(json_file) as f:
            data = json.load(f)
        cats = sorted(data["categories"], key=lambda c: c["id"])
        self._id_map = {c["id"]: i for i, c in enumerate(cats)}
        self._freq = {self._id_map[c["id"]]: c.get("frequency", "f")
                      for c in cats}
        self._img_info = {
            img["id"]: {
                "neg": {self._id_map[c]
                        for c in img.get("neg_category_ids", [])
                        if c in self._id_map},
                "not_exhaustive": {
                    self._id_map[c]
                    for c in img.get("not_exhaustive_category_ids", [])
                    if c in self._id_map},
            }
            for img in data["images"]
        }
        self.reset()

    def reset(self):
        self._ap = CocoAPEvaluator(self.iou_type, max_dets=self.max_dets)

    def merge_from(self, other: "LVISEvaluator"):
        self._ap.merge_from(other._ap)

    def process(self, image_id, scores: np.ndarray, classes: np.ndarray,
                masks: List[np.ndarray]):
        """Predictions at original resolution, contiguous category ids."""
        from ..data.transforms import polygons_to_bitmask

        rec = self._gt_by_id[image_id]
        h, w = rec["height"], rec["width"]
        gt_cats, gt_masks, gt_areas = [], [], []
        for a in rec.get("annotations", []):
            seg = a.get("segmentation")
            if not isinstance(seg, list):
                continue
            m = polygons_to_bitmask([np.asarray(p) for p in seg], h, w)
            gt_cats.append(a["category_id"])
            gt_masks.append(m)
            gt_areas.append(a.get("area", m.sum()))

        info = self._img_info.get(image_id, {"neg": set(),
                                             "not_exhaustive": set()})
        pos = set(gt_cats)
        eval_cats = pos | info["neg"]

        scores = np.asarray(scores)
        classes = np.asarray(classes)
        keep = scores > 0
        # LVIS: cap at max_dets per image ACROSS categories
        order = np.argsort(-scores[keep], kind="mergesort")[: self.max_dets]
        idx = np.nonzero(keep)[0][order]
        self._ap.add_image(
            det_scores=scores[idx],
            det_cats=classes[idx],
            det_masks_or_boxes=[masks[i] for i in idx],
            gt_cats=np.asarray(gt_cats, np.int64),
            gt_masks_or_boxes=gt_masks,
            gt_iscrowd=np.zeros(len(gt_cats), bool),  # no crowd in LVIS
            gt_areas=np.asarray(gt_areas, np.float64),
            eval_cats=eval_cats,
            ignore_unmatched_cats=info["not_exhaustive"],
        )

    def evaluate(self) -> Dict[str, Dict[str, float]]:
        res = self._ap.summarize()
        per_cat = self._ap.per_category_ap()
        for key, freq in (("APr", "r"), ("APc", "c"), ("APf", "f")):
            vals = [ap for c, ap in per_cat.items()
                    if self._freq.get(c) == freq and not np.isnan(ap)]
            res[key] = float(np.mean(vals)) if vals else float("nan")
        return {self.iou_type: res}
