"""Hand-verifiable tests for the numpy COCOeval implementation."""

import numpy as np

from mp_former_tpu.evaluation.coco_eval import (
    CocoAPEvaluator, mask_iou, box_iou, IOU_THRS)


def _mask(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), bool)
    m[y0:y1, x0:x1] = True
    return m


def test_mask_iou_and_crowd():
    a = _mask(10, 10, 0, 5, 0, 10)   # area 50
    b = _mask(10, 10, 0, 10, 0, 10)  # area 100
    iou = mask_iou([a], [b], [False])
    np.testing.assert_allclose(iou, [[0.5]])
    # crowd: intersection / det area = 50/50 = 1
    iou_c = mask_iou([a], [b], [True])
    np.testing.assert_allclose(iou_c, [[1.0]])


def test_box_iou():
    d = np.array([[0, 0, 10, 10]], np.float64)
    g = np.array([[5, 0, 10, 10]], np.float64)
    np.testing.assert_allclose(box_iou(d, g, [False]), [[50 / 150]])


def test_perfect_prediction_ap100():
    ev = CocoAPEvaluator("segm")
    gt = _mask(20, 20, 2, 10, 2, 10)
    ev.add_image(
        det_scores=np.array([0.9]), det_cats=np.array([3]),
        det_masks_or_boxes=[gt.copy()],
        gt_cats=np.array([3]), gt_masks_or_boxes=[gt],
        gt_iscrowd=np.array([False]))
    res = ev.summarize()
    assert abs(res["AP"] - 100.0) < 1e-6
    assert abs(res["AP50"] - 100.0) < 1e-6


def test_high_scoring_false_positive_halves_ap():
    ev = CocoAPEvaluator("segm")
    gt = _mask(20, 20, 2, 10, 2, 10)
    fp = _mask(20, 20, 12, 19, 12, 19)
    ev.add_image(
        det_scores=np.array([0.9, 0.8]), det_cats=np.array([1, 1]),
        det_masks_or_boxes=[fp, gt.copy()],
        gt_cats=np.array([1]), gt_masks_or_boxes=[gt],
        gt_iscrowd=np.array([False]))
    res = ev.summarize()
    assert abs(res["AP"] - 50.0) < 1e-6


def test_low_scoring_false_positive_keeps_ap100():
    ev = CocoAPEvaluator("segm")
    gt = _mask(20, 20, 2, 10, 2, 10)
    fp = _mask(20, 20, 12, 19, 12, 19)
    ev.add_image(
        det_scores=np.array([0.9, 0.2]), det_cats=np.array([1, 1]),
        det_masks_or_boxes=[gt.copy(), fp],
        gt_cats=np.array([1]), gt_masks_or_boxes=[gt],
        gt_iscrowd=np.array([False]))
    assert abs(ev.summarize()["AP"] - 100.0) < 1e-6


def test_iou_threshold_cut():
    """Det with IoU ~0.6 counts only for thresholds <= 0.6 -> AP = 30."""
    ev = CocoAPEvaluator("segm")
    gt = _mask(30, 30, 0, 10, 0, 10)       # area 100
    det = _mask(30, 30, 0, 10, 0, 15)      # overlap 100, union 150, IoU 2/3
    # IoU = 0.667 -> passes thresholds 0.50..0.65 (4 of 10) -> AP 40
    ev.add_image(
        det_scores=np.array([0.9]), det_cats=np.array([1]),
        det_masks_or_boxes=[det],
        gt_cats=np.array([1]), gt_masks_or_boxes=[gt],
        gt_iscrowd=np.array([False]))
    assert abs(ev.summarize()["AP"] - 40.0) < 1e-6


def test_crowd_gt_not_counted_and_not_penalized():
    ev = CocoAPEvaluator("segm")
    crowd = _mask(20, 20, 0, 20, 0, 20)
    det = _mask(20, 20, 0, 10, 0, 10)  # inside crowd -> crowd IoU = 1
    ev.add_image(
        det_scores=np.array([0.9]), det_cats=np.array([1]),
        det_masks_or_boxes=[det],
        gt_cats=np.array([1]), gt_masks_or_boxes=[crowd],
        gt_iscrowd=np.array([True]))
    res = ev.summarize()
    # no countable GT -> category skipped entirely
    assert np.isnan(res["AP"])


def test_missed_gt_drops_recall():
    ev = CocoAPEvaluator("segm")
    g1 = _mask(20, 20, 0, 8, 0, 8)
    g2 = _mask(20, 20, 10, 18, 10, 18)
    ev.add_image(
        det_scores=np.array([0.9]), det_cats=np.array([1]),
        det_masks_or_boxes=[g1.copy()],
        gt_cats=np.array([1, 1]), gt_masks_or_boxes=[g1, g2],
        gt_iscrowd=np.array([False, False]))
    # 1 of 2 GTs found at precision 1: AP = 101-pt interp ~ 50.5? COCO: recall
    # points <= 0.5 have precision 1 -> 51 of 101 points -> 50.495...
    ap = ev.summarize()["AP"]
    assert abs(ap - 100 * 51 / 101) < 1e-6
