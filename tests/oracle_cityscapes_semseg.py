"""Test-only oracle: structural port of cityscapesscripts
evalPixelLevelSemanticLabeling (the scorer behind d2's
CityscapesSemSegEvaluator). Works in LABEL-ID space over a full confusion
matrix like the original:

  * IoU per label: tp = conf[l, l]; fn = row sum - tp; FP counts only
    predictions on NON-IGNORED gt pixels (columns restricted to eval rows),
  * iIoU per label: instance-weighted tp/fn (weight = dataset-wide average
    instance size of the class / this instance's size, instances with
    id >= 1000 only), denominator uses the UNWEIGHTED pixel fp,
  * category scores: within-category confusion counts as TP,
  * averages are nanmeans over eval labels / hasInstances labels.

Keep free of imports from mp_former_tpu.evaluation (label tables are data).
"""

from __future__ import annotations

import numpy as np

from mp_former_tpu.data.datasets.cityscapes_labels import EVAL_LABELS, LABELS

MAX_ID = 256


def confusion(gt_label_map, pred_label_map):
    conf = np.zeros((MAX_ID, MAX_ID), np.int64)
    idx = gt_label_map.astype(np.int64) * MAX_ID + pred_label_map.astype(
        np.int64)
    cnt = np.bincount(idx.reshape(-1), minlength=MAX_ID * MAX_ID)
    return conf + cnt.reshape(MAX_ID, MAX_ID)


def instance_stats(gt_instance_map, pred_label_map):
    """Per-instance (label_id, size, correct_pixels) for ids >= 1000 of
    evaluated hasInstances labels."""
    out = []
    inst = gt_instance_map.astype(np.int64)
    eval_ids = {l.id: l for l in EVAL_LABELS}
    for gid in np.unique(inst[inst >= 1000]):
        lab = int(gid // 1000)
        if lab not in eval_ids or not eval_ids[lab].hasInstances:
            continue
        sel = inst == gid
        out.append((lab, int(sel.sum()),
                    int((pred_label_map[sel] == lab).sum())))
    return out


def evaluate(conf, inst_records):
    eval_rows = [l.id for l in EVAL_LABELS]

    def iou_for_label(lid):
        tp = float(conf[lid, lid])
        fn = float(conf[lid, :].sum()) - tp
        fp = float(conf[eval_rows, lid].sum()) - tp
        denom = tp + fp + fn
        return tp / denom if denom > 0 else float("nan"), fp

    avg_size = {}
    for lab, size, _c in inst_records:
        a = avg_size.setdefault(lab, [0, 0])
        a[0] += size
        a[1] += 1
    avg_size = {k: v[0] / v[1] for k, v in avg_size.items()}

    itp = {l.id: 0.0 for l in EVAL_LABELS}
    ifn = {l.id: 0.0 for l in EVAL_LABELS}
    for lab, size, correct in inst_records:
        w = avg_size[lab] / size
        itp[lab] += w * correct
        ifn[lab] += w * (size - correct)

    ious, iious = [], []
    for l in EVAL_LABELS:
        iou, fp = iou_for_label(l.id)
        ious.append(iou)
        if l.hasInstances:
            denom = itp[l.id] + fp + ifn[l.id]
            iious.append(itp[l.id] / denom if denom > 0 else float("nan"))

    # categories
    cats = sorted({l.catId for l in EVAL_LABELS})
    iou_sup, iiou_sup = [], []
    for c in cats:
        ids = [l.id for l in EVAL_LABELS if l.catId == c]
        tp = float(conf[np.ix_(ids, ids)].sum())
        fn = float(conf[ids, :].sum()) - tp
        fp = float(conf[np.ix_(eval_rows, ids)].sum()) - tp
        denom = tp + fp + fn
        iou_sup.append(tp / denom if denom > 0 else float("nan"))
        if any(l.hasInstances for l in EVAL_LABELS if l.catId == c):
            citp = sum(itp[i] for i in ids)
            cifn = sum(ifn[i] for i in ids)
            denom = citp + fp + cifn
            iiou_sup.append(citp / denom if denom > 0 else float("nan"))

    with np.errstate(invalid="ignore"):
        return {
            "IoU": 100 * float(np.nanmean(ious)),
            "iIoU": 100 * float(np.nanmean(iious)),
            "IoU_sup": 100 * float(np.nanmean(iou_sup)),
            "iIoU_sup": (100 * float(np.nanmean(iiou_sup))
                         if iiou_sup else float("nan")),
        }


def trainid_to_labelid(pred_trainid):
    lut = np.zeros(len(EVAL_LABELS) + 1, np.int64)  # trainId -> labelId
    for l in EVAL_LABELS:
        lut[l.trainId] = l.id
    return lut[np.clip(pred_trainid.astype(np.int64), 0, len(EVAL_LABELS))]
