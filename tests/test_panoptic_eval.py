"""Hand-verifiable PQ tests."""

import numpy as np

from mp_former_tpu.evaluation.panoptic_eval import PanopticEvaluator


def _case(pred_map, pred_segs, gt_map, gt_segs, is_thing=None):
    ev = PanopticEvaluator(is_thing)
    ev.process(pred_map, pred_segs, gt_map, gt_segs)
    return ev.evaluate()["panoptic_seg"]


def test_perfect_pq():
    m = np.zeros((10, 10), np.int32)
    m[:5] = 1
    m[5:] = 2
    segs = [{"id": 1, "category_id": 7}, {"id": 2, "category_id": 3}]
    res = _case(m, segs, m.copy(), [dict(s, iscrowd=0) for s in segs])
    assert abs(res["All"]["PQ"] - 100.0) < 1e-6
    assert res["All"]["n"] == 2


def test_partial_iou():
    gt = np.zeros((10, 10), np.int32)
    gt[:, :10] = 1
    pred = np.zeros((10, 10), np.int32)
    pred[:, :8] = 1  # IoU 0.8
    res = _case(pred, [{"id": 1, "category_id": 5}],
                gt, [{"id": 1, "category_id": 5, "iscrowd": 0}])
    # note: pred-void region (2 cols) subtracts from union: union=100-20+... wait
    # union = gt(100) + pred(80) - inter(80) - void∩pred(0) = 100; IoU=0.8
    assert abs(res["All"]["PQ"] - 80.0) < 1e-6
    assert abs(res["All"]["RQ"] - 100.0) < 1e-6
    assert abs(res["All"]["SQ"] - 80.0) < 1e-6


def test_wrong_class_counts_fp_and_fn():
    gt = np.ones((10, 10), np.int32)
    pred = np.ones((10, 10), np.int32)
    res = _case(pred, [{"id": 1, "category_id": 2}],
                gt, [{"id": 1, "category_id": 5, "iscrowd": 0}])
    # class 5: FN=1 -> PQ 0; class 2: FP=1 -> PQ 0
    assert abs(res["All"]["PQ"] - 0.0) < 1e-6
    assert res["All"]["n"] == 2


def test_crowd_gt_ignored():
    gt = np.ones((10, 10), np.int32)
    pred = np.ones((10, 10), np.int32)
    res = _case(pred, [{"id": 1, "category_id": 5}],
                gt, [{"id": 1, "category_id": 5, "iscrowd": 1}])
    # crowd gt: no TP/FN; pred mostly covered by crowd of same class -> no FP
    assert res["All"]["n"] == 0


def test_things_stuff_split():
    m = np.zeros((4, 4), np.int32)
    m[:2] = 1
    m[2:] = 2
    segs = [{"id": 1, "category_id": 1}, {"id": 2, "category_id": 2}]
    res = _case(m, segs, m.copy(), [dict(s, iscrowd=0) for s in segs],
                is_thing={1: True, 2: False})
    assert res["Things"]["n"] == 1 and res["Stuff"]["n"] == 1
