"""Differential fuzz: shipped CityscapesSemSegEvaluator vs the
evalPixelLevelSemanticLabeling port (tests/oracle_cityscapes_semseg.py) —
void gt handling in FP, instance-weighted iIoU, category aggregation.
"""

import numpy as np
import pytest

from mp_former_tpu.data.datasets.cityscapes_labels import (EVAL_LABELS,
                                                           LABELS)
from mp_former_tpu.evaluation.cityscapes_eval import CityscapesSemSegEvaluator

from oracle_cityscapes_semseg import (confusion, evaluate, instance_stats,
                                      trainid_to_labelid)

VOID_IDS = [l.id for l in LABELS if l.ignoreInEval and l.id >= 0]


def _rand_image(rng, H=48, W=48, n_classes=6):
    """gt labelId map (with void regions + thing instances), gt instanceId
    map, pred trainId map."""
    labels = list(EVAL_LABELS[:n_classes]) + [
        l for l in EVAL_LABELS if l.hasInstances][:3]
    gt = np.full((H, W), int(rng.choice(VOID_IDS)), np.int64)
    inst = np.zeros((H, W), np.int64)
    counters = {}
    for _ in range(rng.randint(2, 7)):
        lab = labels[rng.randint(0, len(labels))]
        y, x = rng.randint(0, H - 6), rng.randint(0, W - 6)
        h = rng.randint(4, max(5, min(24, H - y)))
        w = rng.randint(4, max(5, min(24, W - x)))
        gt[y:y + h, x:x + w] = lab.id
        if lab.hasInstances:
            counters[lab.id] = counters.get(lab.id, 0) + 1
            inst[y:y + h, x:x + w] = lab.id * 1000 + counters[lab.id]
        else:
            inst[y:y + h, x:x + w] = lab.id
    # predictions: gt trainIds corrupted with noise + random rectangles
    lut = np.full(256, 0, np.int64)
    for l in EVAL_LABELS:
        lut[l.id] = l.trainId
    pred = lut[np.clip(gt, 0, 255)]
    pred[gt == VOID_IDS[0]] = rng.randint(0, len(EVAL_LABELS))
    for _ in range(rng.randint(0, 4)):
        y, x = rng.randint(0, H - 6), rng.randint(0, W - 6)
        pred[y:y + 8, x:x + 8] = rng.randint(0, len(EVAL_LABELS))
    return gt, inst, pred


@pytest.mark.parametrize("seed", range(200))
def test_fuzz_cityscapes_semseg(seed):
    rng = np.random.RandomState(seed)
    shipped = CityscapesSemSegEvaluator()
    conf = None
    inst_records = []
    for _ in range(rng.randint(1, 4)):
        gt, inst, pred = _rand_image(rng)
        shipped.process(pred, {}, gt_label_map=gt, gt_instance_map=inst)
        pred_lid = trainid_to_labelid(pred)
        c = confusion(gt, pred_lid)
        conf = c if conf is None else conf + c
        inst_records.extend(instance_stats(inst, pred_lid))
    got = shipped.evaluate()["sem_seg"]
    want = evaluate(conf, inst_records)
    for k in ("IoU", "iIoU", "IoU_sup", "iIoU_sup"):
        a, b = got[k], want[k]
        if np.isnan(a) and np.isnan(b):
            continue
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-12,
                                   err_msg=f"seed={seed} {k}")


def test_perfect_prediction_is_100():
    lab = EVAL_LABELS[0]
    gt = np.full((32, 32), lab.id, np.int64)
    inst = np.full((32, 32), lab.id, np.int64)
    lut = np.full(256, 0, np.int64)
    for l in EVAL_LABELS:
        lut[l.id] = l.trainId
    pred = lut[gt]
    shipped = CityscapesSemSegEvaluator()
    shipped.process(pred, {}, gt_label_map=gt, gt_instance_map=inst)
    got = shipped.evaluate()["sem_seg"]
    assert abs(got["IoU"] - 100) < 1e-9
