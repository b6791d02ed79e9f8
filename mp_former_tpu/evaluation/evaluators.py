"""Dataset evaluators following the d2 protocol (reset/process/evaluate).

- COCOEvaluator / InstanceSegEvaluator: mask AP via the numpy COCOeval
  (evaluation/coco_eval.py). The reference's InstanceSegEvaluator only
  relaxes contiguous-id checks (instance_evaluation.py:29-107) — ids here
  are arbitrary already.
- SemSegEvaluator: confusion-matrix mIoU/fwIoU/pACC (d2 semantics).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from .coco_eval import CocoAPEvaluator


class COCOEvaluator:
    def __init__(self, dataset_records: List[dict], iou_type: str = "segm",
                 max_dets: int = 100):
        self._gt_by_id = {r["image_id"]: r for r in dataset_records}
        self.iou_type = iou_type
        self.max_dets = max_dets
        self.reset()

    def reset(self):
        self._ap = CocoAPEvaluator(self.iou_type, self.max_dets)

    def merge_from(self, other: "COCOEvaluator"):
        self._ap.merge_from(other._ap)

    def process(self, image_id, scores: np.ndarray, classes: np.ndarray,
                masks: List[np.ndarray]):
        """Predictions at ORIGINAL image resolution; GT rasterized lazily."""
        from ..data.transforms import polygons_to_bitmask

        rec = self._gt_by_id[image_id]
        h, w = rec["height"], rec["width"]
        gt_cats, gt_masks, gt_crowd, gt_areas = [], [], [], []
        for a in rec.get("annotations", []):
            seg = a.get("segmentation")
            if isinstance(seg, list):
                m = polygons_to_bitmask(
                    [np.asarray(p) for p in seg], h, w)
            elif isinstance(seg, dict) and isinstance(seg.get("counts"), list):
                mh, mw = seg["size"]
                flat = np.zeros(mh * mw, np.uint8)
                pos, val = 0, 0
                for c in seg["counts"]:
                    flat[pos:pos + c] = val
                    pos += c
                    val = 1 - val
                m = flat.reshape(mw, mh).T.astype(bool)
            else:
                continue
            gt_cats.append(a["category_id"])
            gt_masks.append(m)
            gt_crowd.append(bool(a.get("iscrowd", 0)))
            gt_areas.append(a.get("area", m.sum()))
        keep = scores > 0
        self._ap.add_image(
            det_scores=np.asarray(scores)[keep],
            det_cats=np.asarray(classes)[keep],
            det_masks_or_boxes=[m for m, k in zip(masks, keep) if k],
            gt_cats=np.asarray(gt_cats, np.int64),
            gt_masks_or_boxes=gt_masks,
            gt_iscrowd=np.asarray(gt_crowd, bool),
            gt_areas=np.asarray(gt_areas, np.float64),
        )

    def evaluate(self) -> Dict[str, float]:
        return {"segm": self._ap.summarize()}


InstanceSegEvaluator = COCOEvaluator


class COCOPanopticEvaluator:
    """d2 COCOPanopticEvaluator role: PQ against panoptic png GT
    (replaces the reference's disabled new_pano_ev, train_net.py:82-135)."""

    def __init__(self, is_thing: Optional[Dict[int, bool]] = None):
        from .panoptic_eval import PanopticEvaluator

        self._pq = PanopticEvaluator(is_thing)

    def reset(self):
        self._pq.reset()

    def merge_from(self, other: "COCOPanopticEvaluator"):
        self._pq.merge_from(other._pq)

    def process_prediction(self, record: dict, pred_map: np.ndarray,
                           pred_segments: List[dict]):
        import cv2

        from ..data.dataset_mappers.mask_former_mappers import rgb2id

        pan = cv2.imread(record["pan_seg_file_name"], cv2.IMREAD_COLOR)
        gt_map = rgb2id(cv2.cvtColor(pan, cv2.COLOR_BGR2RGB))
        gt_segments = record["segments_info"]
        if gt_map.shape != pred_map.shape:
            pred_map = cv2.resize(
                pred_map.astype(np.int32), (gt_map.shape[1], gt_map.shape[0]),
                interpolation=cv2.INTER_NEAREST)
        self._pq.process(pred_map, pred_segments, gt_map.astype(np.int64),
                         gt_segments)

    def evaluate(self):
        return self._pq.evaluate()


class SemSegEvaluator:
    """d2 SemSegEvaluator: N+1 confusion matrix with ignore label."""

    def __init__(self, num_classes: int, ignore_label: int = 255):
        self.num_classes = num_classes
        self.ignore_label = ignore_label
        self.reset()

    def reset(self):
        self._conf = np.zeros((self.num_classes + 1, self.num_classes + 1), np.int64)

    def merge_from(self, other: "SemSegEvaluator"):
        self._conf += other._conf

    def process(self, pred: np.ndarray, gt: np.ndarray):
        """pred: (H, W) int class ids; gt: (H, W) with ignore_label."""
        pred = pred.astype(np.int64)
        gt = gt.astype(np.int64).copy()
        gt[gt == self.ignore_label] = self.num_classes
        self._conf += np.bincount(
            (self.num_classes + 1) * pred.reshape(-1) + gt.reshape(-1),
            minlength=self._conf.size).reshape(self._conf.shape)

    def evaluate(self) -> Dict[str, float]:
        acc = np.full(self.num_classes, np.nan)
        iou = np.full(self.num_classes, np.nan)
        tp = self._conf.diagonal()[:-1].astype(np.float64)
        pos_gt = self._conf[:-1, :-1].sum(0).astype(np.float64)
        # exclude the ignore GT column (d2 sums conf[:-1, :-1]): predictions
        # over ignored pixels must not inflate the union / deflate IoU
        pos_pred = self._conf[:-1, :-1].sum(1).astype(np.float64)
        class_weights = pos_gt / max(pos_gt.sum(), 1)
        valid = pos_gt > 0
        acc[valid] = tp[valid] / pos_gt[valid]
        union = pos_gt + pos_pred - tp
        iou_valid = np.logical_and(valid, union > 0)
        iou[iou_valid] = tp[iou_valid] / union[iou_valid]
        miou = float(np.nanmean(iou[valid])) if valid.any() else float("nan")
        fiou = float((iou[iou_valid] * class_weights[iou_valid]).sum())
        pacc = float(tp.sum() / max(pos_gt.sum(), 1))
        macc = float(np.nanmean(acc[valid])) if valid.any() else float("nan")
        return {"sem_seg": {
            "mIoU": 100 * miou, "fwIoU": 100 * fiou,
            "mACC": 100 * macc, "pACC": 100 * pacc,
        }}
