"""Cityscapes official-protocol evaluators (evaluation/cityscapes_eval.py)
on synthetic hand-computable images (reference dispatches these datasets to
cityscapesscripts via d2, train_net.py:187-204)."""

import numpy as np

from mp_former_tpu.evaluation.cityscapes_eval import (
    CityscapesInstanceEvaluator, CityscapesSemSegEvaluator)

CAR = 26       # labelId
ROAD = 7
UNLABELED = 0
CAR_TRAIN = 13
ROAD_TRAIN = 0


def _gt_map():
    """100x100: road background, one 20x20 car instance, 10x10 void."""
    inst = np.full((100, 100), ROAD, np.int32)
    inst[10:30, 10:30] = CAR * 1000  # car instance #0
    inst[80:90, 80:90] = UNLABELED
    return inst


def _mask(y0, y1, x0, x1):
    m = np.zeros((100, 100), bool)
    m[y0:y1, x0:x1] = True
    return m


def test_instance_perfect_match():
    ev = CityscapesInstanceEvaluator()
    ev.process({}, np.array([0.9]), np.array([CAR_TRAIN - 11]),  # car contiguous idx 2
               [_mask(10, 30, 10, 30)], gt_instance_map=_gt_map())
    res = ev.evaluate()["segm"]
    assert abs(res["AP"] - 100.0) < 1e-6
    assert abs(res["AP50"] - 100.0) < 1e-6
    assert abs(res["AP-car"] - 100.0) < 1e-6
    assert np.isnan(res["AP-person"])


def test_instance_partial_iou():
    """IoU = 200/600 = 1/3 < 0.5 -> never matches, AP 0; a (10:30, 10:20)
    pred has IoU 200/400 = 0.5, not > 0.5 -> also unmatched; (10:30, 10:24)
    gives IoU 280/400 = 0.7 -> matches overlaps .50-.65 (4 of 10)."""
    ev = CityscapesInstanceEvaluator()
    ev.process({}, np.array([0.9]), np.array([2]),
               [_mask(10, 30, 10, 24)], gt_instance_map=_gt_map())
    res = ev.evaluate()["segm"]
    assert abs(res["AP-car"] - 40.0) < 1e-6  # 4/10 overlaps matched
    assert abs(res["AP50"] - 100.0) < 1e-6


def test_instance_fp_on_stuff_counts_fp_on_void_ignored():
    ev = CityscapesInstanceEvaluator()
    # perfect match + 1 FP fully on road (counts) with HIGHER score:
    # at every overlap y=[1@0.8, 0@0.9]: sweeping scores descending,
    # first point p=0 r=0, then p=0.5 r=1 -> AP = 0.25 (trapezoid 0->1 with
    # p rising 0->0.5 averaged = 0.25)
    ev.process({}, np.array([0.8, 0.9]), np.array([2, 2]),
               [_mask(10, 30, 10, 30), _mask(40, 60, 40, 60)],
               gt_instance_map=_gt_map())
    res = ev.evaluate()["segm"]
    assert abs(res["AP-car"] - 25.0) < 1e-6

    # FP fully on void pixels -> ignored, AP stays 100
    ev.reset()
    ev.process({}, np.array([0.8, 0.9]), np.array([2, 2]),
               [_mask(10, 30, 10, 30), _mask(80, 90, 80, 90)],
               gt_instance_map=_gt_map())
    assert abs(ev.evaluate()["segm"]["AP-car"] - 100.0) < 1e-6


def test_instance_group_region_ignored():
    """A same-class group region (id < 1000) absorbs unmatched preds."""
    inst = _gt_map()
    inst[40:60, 40:60] = CAR  # car group (crowd), id == labelId
    ev = CityscapesInstanceEvaluator()
    ev.process({}, np.array([0.8, 0.9]), np.array([2, 2]),
               [_mask(10, 30, 10, 30), _mask(40, 60, 40, 60)],
               gt_instance_map=inst)
    assert abs(ev.evaluate()["segm"]["AP-car"] - 100.0) < 1e-6


def test_instance_small_gt_ignored():
    """GT below min region size neither demands a match nor yields FPs."""
    inst = np.full((100, 100), ROAD, np.int32)
    inst[0:5, 0:5] = CAR * 1000  # 25 px < 100
    ev = CityscapesInstanceEvaluator()
    ev.process({}, np.array([0.9]), np.array([2]), [_mask(0, 5, 0, 5)],
               gt_instance_map=inst)
    res = ev.evaluate()["segm"]
    assert np.isnan(res["AP-car"])  # no valid gt anywhere


def test_instance_missed_gt_lowers_recall():
    """Two GTs, one matched: recall caps at 0.5 -> AP 0.5."""
    inst = _gt_map()
    inst[40:60, 40:60] = CAR * 1000 + 1
    ev = CityscapesInstanceEvaluator()
    ev.process({}, np.array([0.9]), np.array([2]), [_mask(10, 30, 10, 30)],
               gt_instance_map=inst)
    assert abs(ev.evaluate()["segm"]["AP-car"] - 50.0) < 1e-6


def test_semseg_perfect():
    gt_labels = np.full((100, 100), ROAD, np.int32)
    gt_labels[10:30, 10:30] = CAR
    pred = np.full((100, 100), ROAD_TRAIN, np.int64)
    pred[10:30, 10:30] = CAR_TRAIN
    inst = _gt_map()
    inst[80:90, 80:90] = ROAD  # keep it simple: no void here
    gt_labels[80:90, 80:90] = ROAD
    ev = CityscapesSemSegEvaluator()
    ev.process(pred, {}, gt_label_map=gt_labels, gt_instance_map=inst)
    res = ev.evaluate()["sem_seg"]
    assert abs(res["IoU"] - 100.0) < 1e-6
    assert abs(res["iIoU"] - 100.0) < 1e-6
    assert abs(res["IoU_sup"] - 100.0) < 1e-6


def test_semseg_void_gt_not_fp():
    """Predictions on void GT pixels don't count against any class."""
    gt_labels = np.full((100, 100), ROAD, np.int32)
    gt_labels[0:10, :] = UNLABELED
    pred = np.full((100, 100), ROAD_TRAIN, np.int64)
    ev = CityscapesSemSegEvaluator()
    ev.process(pred, {}, gt_label_map=gt_labels)
    res = ev.evaluate()["sem_seg"]
    assert abs(res["IoU"] - 100.0) < 1e-6


def test_semseg_iiou_weights_small_instances():
    """Two cars 400px and 100px; the small one fully missed. Plain IoU
    ignores balance (tp=400 of 500); iIoU weights each instance by
    avg_size/size: avg=250 -> big w=.625 (tp 250), small w=2.5 (fn 250)
    -> iIoU = 250/500 = 50%."""
    gt_labels = np.full((100, 100), ROAD, np.int32)
    gt_labels[10:30, 10:30] = CAR
    gt_labels[50:60, 50:60] = CAR
    inst = gt_labels.astype(np.int64) * 1
    inst[gt_labels == ROAD] = ROAD
    inst[10:30, 10:30] = CAR * 1000
    inst[50:60, 50:60] = CAR * 1000 + 1
    pred = np.full((100, 100), ROAD_TRAIN, np.int64)
    pred[10:30, 10:30] = CAR_TRAIN  # big car found, small car missed
    ev = CityscapesSemSegEvaluator()
    ev.process(pred, {}, gt_label_map=gt_labels, gt_instance_map=inst)
    res = ev.evaluate()["sem_seg"]
    assert abs(res["iIoU"] - 50.0) < 1e-6
    # plain car IoU = 400/500 = 80; mean IoU over {road, car}:
    # road: tp 9500, fp (pred road on gt car) 100, fn 0 -> 9500/9600
    road_iou = 9500 / 9600
    assert abs(res["IoU"] - 100 * (road_iou + 0.8) / 2) < 1e-4


def test_semseg_category_merges_confusion():
    """gt wall predicted as fence: class IoU penalized, category
    ('construction') IoU perfect."""
    WALL, FENCE = 12, 13
    gt_labels = np.full((50, 50), WALL, np.int32)
    pred = np.full((50, 50), 4, np.int64)  # fence trainId
    ev = CityscapesSemSegEvaluator()
    ev.process(pred, {}, gt_label_map=gt_labels)
    res = ev.evaluate()["sem_seg"]
    assert res["IoU"] < 1e-6  # wall 0, fence 0 (fp only), rest nan
    assert abs(res["IoU_sup"] - 100.0) < 1e-6


def test_instance_ap_artificial_start_point():
    """The PR curve is anchored at (r=0, p=1.0) — the official
    cityscapesscripts artificial point — so a top-scored false positive
    does not erase the first trapezoid's area (regression)."""
    from mp_former_tpu.evaluation.cityscapes_eval import _average_precision

    # one FP at score .9, one TP at score .8, one GT
    y_true = np.array([0.0, 1.0])
    y_score = np.array([0.9, 0.8])
    ap = _average_precision(y_true, y_score, hard_fns=0)
    # curve: (0,1) -> (0, .0? ) points: after FP: r=0, p=0; after TP: r=1, p=.5
    # trapezoids: (0->0)=0, (0->1): (0+... compute expected directly
    # points r=[0,0,1], p=[1,0,.5] -> area = (0-0)*(1+0)/2 + (1-0)*(0+.5)/2
    assert abs(ap - 0.25) < 1e-9, ap
