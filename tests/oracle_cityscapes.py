"""Test-only oracle: structural port of cityscapesscripts
evalInstanceLevelSemanticLabeling (the scorer behind d2's
CityscapesInstanceEvaluator, reference train_net.py:187-204).

Mirrors the original's code structure and quirks:
  * instances2dict-style per-image instance records with matchedPred /
    matchedGt cross-links (matching restricted to same-label pairs),
  * matchable gt = real instances (instID >= 1000) with pixelCount >=
    minRegionSize; group regions (instID < 1000) and small instances only
    contribute to the FP-ignore rule,
  * duplicate matches of one gt keep the max score, the min score is
    appended as an extra FP,
  * unmatched preds ignored when (void + same-label group + same-label
    small-gt intersection) / predPixels > overlapTh,
  * the threshold-swept P/R curve with the artificial (p=1, r=0) point and
    the [-0.5, 0, 0.5] convolution step widths,
  * AP = nanmean over overlaps 0.50:0.05:0.95 then over classes.

Only dense-mask logic — no file IO. Keep free of imports from
mp_former_tpu.evaluation (label tables are shared data, not logic).
"""

from __future__ import annotations

import numpy as np

from mp_former_tpu.data.datasets.cityscapes_labels import (INSTANCE_LABELS,
                                                           LABELS)

OVERLAPS = np.arange(0.5, 1.0, 0.05)
MIN_REGION_SIZE = 100
VOID_IDS = frozenset(l.id for l in LABELS if l.ignoreInEval)


def _image_instances(inst_map, pred_masks, pred_scores, pred_classes):
    """Build per-label gt/pred instance records with cross intersections,
    instances2dict-style. Returns {label_index: (gts, preds)} where
    gts = [{instID, pixelCount, intersections: {pred_i: n}, is_group}],
    preds = [{pixelCount, confidence, void_intersection,
              intersections: {gt_j: n}}]."""
    inst_map = inst_map.astype(np.int64)
    label_map = np.where(inst_map >= 1000, inst_map // 1000, inst_map)
    void_mask = np.isin(label_map, list(VOID_IDS))
    out = {}
    for ci, lab in enumerate(INSTANCE_LABELS):
        on_label = label_map == lab.id
        gts = []
        for gid in np.unique(inst_map[on_label]):
            m = inst_map == gid
            gts.append({"instID": int(gid), "pixelCount": int(m.sum()),
                        "mask": m, "is_group": gid < 1000})
        preds = []
        for pi, pm in enumerate(pred_masks):
            if pred_classes[pi] != ci:
                continue
            pm = pm.astype(bool)
            preds.append({
                "pixelCount": int(pm.sum()),
                "confidence": float(pred_scores[pi]),
                "voidIntersection": int((pm & void_mask).sum()),
                "gtIntersections": [int((pm & g["mask"]).sum())
                                    for g in gts],
            })
        out[ci] = (gts, preds)
    return out


def evaluate_images(per_image, min_region_size=MIN_REGION_SIZE):
    """per_image: list of dicts from _image_instances. Returns the metric
    dict {AP, AP50, AP-<class>} in percent."""
    ap_matrix = np.full((len(INSTANCE_LABELS), len(OVERLAPS)), np.nan)
    for ci in range(len(INSTANCE_LABELS)):
        for oi, overlap_th in enumerate(OVERLAPS):
            y_true = np.empty(0)
            y_score = np.empty(0)
            hard_fns = 0
            has_gt = False
            has_pred = False
            for img in per_image:
                gts, preds = img[ci]
                matchable = [g for g in gts
                             if not g["is_group"]
                             and g["pixelCount"] >= min_region_size]
                has_gt = has_gt or bool(matchable)
                has_pred = has_pred or bool(preds)

                cur_true = np.ones(len(matchable))
                cur_score = np.ones(len(matchable)) * (-np.inf)
                cur_match = np.zeros(len(matchable), dtype=bool)
                for gi, gt in enumerate(matchable):
                    found_match = False
                    gidx = gts.index(gt)
                    for pred in preds:
                        inter = pred["gtIntersections"][gidx]
                        ov = inter / (gt["pixelCount"]
                                      + pred["pixelCount"] - inter)
                        if ov > overlap_th:
                            confidence = pred["confidence"]
                            if cur_match[gi]:
                                max_s = max(cur_score[gi], confidence)
                                min_s = min(cur_score[gi], confidence)
                                cur_score[gi] = max_s
                                cur_true = np.append(cur_true, 0)
                                cur_score = np.append(cur_score, min_s)
                                cur_match = np.append(cur_match, True)
                            else:
                                found_match = True
                                cur_match[gi] = True
                                cur_score[gi] = confidence
                    if not found_match:
                        hard_fns += 1
                cur_true = cur_true[cur_match]
                cur_score = cur_score[cur_match]

                for pred in preds:
                    if pred["pixelCount"] == 0:
                        continue
                    found_gt_match = False
                    for gi, gt in enumerate(matchable):
                        gidx = gts.index(gt)
                        inter = pred["gtIntersections"][gidx]
                        ov = inter / (gt["pixelCount"]
                                      + pred["pixelCount"] - inter)
                        if ov > overlap_th:
                            found_gt_match = True
                            break
                    if found_gt_match:
                        continue
                    nb_ignore = pred["voidIntersection"]
                    for gj, gt in enumerate(gts):
                        if gt["is_group"] or gt["pixelCount"] < min_region_size:
                            nb_ignore += pred["gtIntersections"][gj]
                    if nb_ignore / pred["pixelCount"] <= overlap_th:
                        cur_true = np.append(cur_true, 0)
                        cur_score = np.append(cur_score, pred["confidence"])
                y_true = np.append(y_true, cur_true)
                y_score = np.append(y_score, cur_score)

            if has_gt:
                if len(y_score) == 0 and hard_fns == 0:
                    ap = 0.0 if has_pred else 0.0
                    # no matchable outcome at all: official yields 0 when
                    # predictions exist; with neither, recall undefined -> 0
                    ap_matrix[ci, oi] = ap
                    continue
                sort = np.argsort(y_score, kind="stable")
                ys = y_score[sort]
                yt = y_true[sort]
                cum = np.cumsum(yt)
                thresholds, unique_idx = np.unique(ys, return_index=True)
                nb_pr = len(unique_idx) + 1
                nb_examples = len(ys)
                nb_true = cum[-1] if nb_examples else 0.0
                precision = np.zeros(nb_pr)
                recall = np.zeros(nb_pr)
                for ri, si in enumerate(unique_idx):
                    below = cum[si - 1] if si > 0 else 0.0
                    tp = nb_true - below
                    fp = nb_examples - si - tp
                    fn = below + hard_fns
                    precision[ri] = tp / (tp + fp)
                    recall[ri] = tp / (tp + fn) if (tp + fn) else 0.0
                precision[-1] = 1.0
                recall[-1] = 0.0
                rec_conv = np.concatenate([[recall[0]], recall, [0.0]])
                step = np.convolve(rec_conv, [-0.5, 0, 0.5], "valid")
                ap_matrix[ci, oi] = float(np.dot(precision, step))
            elif has_pred:
                ap_matrix[ci, oi] = float("nan")

    with np.errstate(invalid="ignore"):
        per_class = np.nanmean(ap_matrix, axis=1)
        ap = (float(np.nanmean(per_class))
              if not np.all(np.isnan(per_class)) else float("nan"))
        ap50 = (float(np.nanmean(ap_matrix[:, 0]))
                if not np.all(np.isnan(ap_matrix[:, 0])) else float("nan"))
    res = {"AP": 100 * ap, "AP50": 100 * ap50}
    for ci, lab in enumerate(INSTANCE_LABELS):
        res[f"AP-{lab.name}"] = 100 * float(per_class[ci])
    return res
