"""Differential fuzz: shipped numpy PQ evaluator vs a faithful panopticapi
port (tests/oracle_panoptic.py).

The reference scores panoptic tasks via panopticapi's pq_compute (d2
COCOPanopticEvaluator); the shipped evaluation/panoptic_eval.py is a
reimplementation — fuzz both over random segment maps covering void
regions, crowds (including multiple crowds of one category), zero-area
gt segments, and category collisions.
"""

import numpy as np
import pytest

from mp_former_tpu.evaluation.panoptic_eval import PanopticEvaluator

from oracle_panoptic import (PQStatCatOracle, pq_average,
                             pq_compute_single_image)


def _rand_panoptic(rng, H=32, W=32, n_gt=5, n_pred=5, n_cats=3,
                   crowd_p=0.25, void_blob=True, zero_area_gt_p=0.1):
    """Random id maps painted as overlapping rectangles (later wins);
    id 0 = void."""
    gt_map = np.zeros((H, W), np.int32)
    gt_segments = []
    for sid in range(1, rng.randint(1, n_gt + 1) + 1):
        y, x = rng.randint(0, H - 4), rng.randint(0, W - 4)
        h, w = rng.randint(3, H - y), rng.randint(3, W - x)
        gt_map[y:y + h, x:x + w] = sid
        gt_segments.append({"id": sid,
                            "category_id": int(rng.randint(1, n_cats + 1)),
                            "iscrowd": int(rng.rand() < crowd_p)})
    if void_blob and rng.rand() < 0.7:
        y, x = rng.randint(0, H - 4), rng.randint(0, W - 4)
        gt_map[y:y + 6, x:x + 6] = 0
    # areas from the final map (painted rectangles overlap)
    for s in gt_segments:
        s["area"] = int((gt_map == s["id"]).sum())
    if rng.rand() < zero_area_gt_p:
        # a segments_info entry fully painted over: zero map pixels but
        # still present in the annotation (panopticapi counts it FN)
        gt_segments.append({"id": 200, "category_id": 1, "iscrowd": 0,
                            "area": 0})

    pred_map = np.zeros((H, W), np.int32)
    for sid in range(1, rng.randint(1, n_pred + 1) + 1):
        y, x = rng.randint(0, H - 4), rng.randint(0, W - 4)
        h, w = rng.randint(3, H - y), rng.randint(3, W - x)
        pred_map[y:y + h, x:x + w] = sid
    pred_segments = [{"id": int(sid),
                      "category_id": int(rng.randint(1, n_cats + 1))}
                     for sid in np.unique(pred_map) if sid != 0]
    return gt_map, gt_segments, pred_map, pred_segments


def _compare(cases, seed):
    shipped = PanopticEvaluator()
    stat = PQStatCatOracle()
    cats = set()
    for gt_map, gt_segments, pred_map, pred_segments in cases:
        shipped.process(pred_map, pred_segments, gt_map, gt_segments)
        pq_compute_single_image(stat, gt_map, pred_map, gt_segments,
                                pred_segments)
        cats |= {s["category_id"] for s in gt_segments}
        cats |= {s["category_id"] for s in pred_segments}
    got = shipped.evaluate()["panoptic_seg"]["All"]
    want = pq_average(stat, sorted(cats))
    assert got["n"] == want["n"], f"seed={seed} n {got['n']} != {want['n']}"
    for k in ("PQ", "SQ", "RQ"):
        a, b = got[k], want[k]
        if np.isnan(a) and np.isnan(b):
            continue
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-12,
                                   err_msg=f"seed={seed} {k}")


@pytest.mark.parametrize("seed", range(300))
def test_fuzz_pq(seed):
    rng = np.random.RandomState(seed)
    cases = [_rand_panoptic(rng) for _ in range(rng.randint(1, 4))]
    _compare(cases, seed)


@pytest.mark.parametrize("seed", range(300, 450))
def test_fuzz_pq_crowd_heavy(seed):
    """Many crowds, few categories — multiple same-category crowds exercise
    panopticapi's one-crowd-label-per-category FP ignore rule."""
    rng = np.random.RandomState(seed)
    cases = [_rand_panoptic(rng, n_gt=7, n_cats=2, crowd_p=0.6)
             for _ in range(2)]
    _compare(cases, seed)


@pytest.mark.parametrize("seed", range(450, 550))
def test_fuzz_pq_void_heavy(seed):
    """Large void regions push the FP void-coverage rule and the union
    void subtraction."""
    rng = np.random.RandomState(seed)
    cases = []
    for _ in range(2):
        gt_map, gt_seg, pred_map, pred_seg = _rand_panoptic(
            rng, n_cats=2, crowd_p=0.15)
        gt_map[:16] = 0  # half the canvas void
        for s in gt_seg:
            s["area"] = int((gt_map == s["id"]).sum())
        cases.append((gt_map, gt_seg, pred_map, pred_seg))
    _compare(cases, seed)


def test_exact_match_is_pq100():
    gt_map = np.zeros((16, 16), np.int32)
    gt_map[2:10, 2:10] = 1
    gt_map[10:15, 10:15] = 2
    segs = [{"id": 1, "category_id": 1, "iscrowd": 0, "area": 64},
            {"id": 2, "category_id": 2, "iscrowd": 0, "area": 25}]
    pred_segs = [{"id": 1, "category_id": 1}, {"id": 2, "category_id": 2}]
    shipped = PanopticEvaluator()
    shipped.process(gt_map, pred_segs, gt_map, segs)
    got = shipped.evaluate()["panoptic_seg"]["All"]
    stat = PQStatCatOracle()
    pq_compute_single_image(stat, gt_map, gt_map, segs, pred_segs)
    want = pq_average(stat, [1, 2])
    assert abs(got["PQ"] - 100) < 1e-9 and abs(want["PQ"] - 100) < 1e-9
