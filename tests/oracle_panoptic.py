"""Test-only oracle: structural port of panopticapi pq_compute_single_core
+ pq_average (panopticapi/evaluation.py), the scorer behind the reference's
COCOPanopticEvaluator. Mirrors the original's quirks:

  * gt segment areas TRUSTED from segments_info (not recomputed),
  * crowd gts skipped in matching; FN loop records ONE crowd label per
    category (dict overwrite — last crowd of a category wins) and the FP
    void-ignore check uses only that label's intersection,
  * unmatched gt segments counted FN even with zero map area,
  * union subtracts the pred's intersection with VOID,
  * per-class PQ = iou_sum / (tp + fp/2 + fn/2), averaged over classes with
    tp+fp+fn > 0.

Keep free of imports from mp_former_tpu.evaluation.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

VOID = 0
OFFSET = 256 * 256 * 256


class PQStatCatOracle:
    def __init__(self):
        self.iou = defaultdict(float)
        self.tp = defaultdict(int)
        self.fp = defaultdict(int)
        self.fn = defaultdict(int)


def pq_compute_single_image(stat, pan_gt, pan_pred, gt_segments,
                            pred_segments):
    """gt_segments: [{id, category_id, iscrowd, area}], pred_segments:
    [{id, category_id}] (areas derived from the map, panopticapi-style)."""
    gt_segms = {el["id"]: dict(el) for el in gt_segments}
    pred_segms = {el["id"]: dict(el) for el in pred_segments}

    # pred areas from the map; every non-void map label must be declared
    pred_labels_set = set(pred_segms)
    labels, labels_cnt = np.unique(pan_pred, return_counts=True)
    for label, label_cnt in zip(labels, labels_cnt):
        if label == VOID:
            continue
        if label not in pred_segms:
            raise KeyError(f"pred label {label} not in segments_info")
        pred_segms[label]["area"] = int(label_cnt)
        pred_labels_set.discard(label)
    if pred_labels_set:
        raise KeyError(f"segments_info ids absent from map: {pred_labels_set}")

    pan_gt = pan_gt.astype(np.uint64)
    pan_pred = pan_pred.astype(np.uint64)
    pan_gt_pred = pan_gt * OFFSET + pan_pred
    gt_pred_map = {}
    lbls, cnts = np.unique(pan_gt_pred, return_counts=True)
    for label, intersection in zip(lbls, cnts):
        gt_id = int(label // OFFSET)
        pred_id = int(label % OFFSET)
        gt_pred_map[(gt_id, pred_id)] = int(intersection)

    gt_matched = set()
    pred_matched = set()
    for (gt_label, pred_label), intersection in gt_pred_map.items():
        if gt_label not in gt_segms:
            continue
        if pred_label not in pred_segms:
            continue
        if gt_segms[gt_label]["iscrowd"] == 1:
            continue
        if (gt_segms[gt_label]["category_id"]
                != pred_segms[pred_label]["category_id"]):
            continue
        union = (pred_segms[pred_label]["area"]
                 + gt_segms[gt_label]["area"] - intersection
                 - gt_pred_map.get((VOID, pred_label), 0))
        iou = intersection / union
        if iou > 0.5:
            cat = gt_segms[gt_label]["category_id"]
            stat.tp[cat] += 1
            stat.iou[cat] += iou
            gt_matched.add(gt_label)
            pred_matched.add(pred_label)

    crowd_labels_dict = {}
    for gt_label, gt_info in gt_segms.items():
        if gt_label in gt_matched:
            continue
        if gt_info["iscrowd"] == 1:
            crowd_labels_dict[gt_info["category_id"]] = gt_label
            continue
        stat.fn[gt_info["category_id"]] += 1

    for pred_label, pred_info in pred_segms.items():
        if pred_label in pred_matched:
            continue
        if "area" not in pred_info:  # declared but zero pixels: impossible
            continue                 # (rejected above), kept for symmetry
        intersection = gt_pred_map.get((VOID, pred_label), 0)
        if pred_info["category_id"] in crowd_labels_dict:
            intersection += gt_pred_map.get(
                (crowd_labels_dict[pred_info["category_id"]], pred_label), 0)
        if intersection / pred_info["area"] > 0.5:
            continue
        stat.fp[pred_info["category_id"]] += 1


def pq_average(stat, cats):
    pq = sq = rq = 0.0
    n = 0
    for c in cats:
        tp, fp, fn = stat.tp[c], stat.fp[c], stat.fn[c]
        if tp + fp + fn == 0:
            continue
        n += 1
        pq += stat.iou[c] / (tp + 0.5 * fp + 0.5 * fn)
        sq += stat.iou[c] / tp if tp != 0 else 0.0
        rq += tp / (tp + 0.5 * fp + 0.5 * fn)
    if n == 0:
        return {"PQ": float("nan"), "SQ": float("nan"),
                "RQ": float("nan"), "n": 0}
    return {"PQ": 100 * pq / n, "SQ": 100 * sq / n, "RQ": 100 * rq / n,
            "n": n}
