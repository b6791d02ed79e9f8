"""Differential fuzz: shipped CityscapesInstanceEvaluator vs a faithful
cityscapesscripts evalInstanceLevelSemanticLabeling port
(tests/oracle_cityscapes.py).

Random instance-id maps with real instances (labelId*1000+i), same-class
group regions (id == labelId), void regions, sub-minRegionSize instances,
duplicate matches, and score ties.
"""

import numpy as np
import pytest

from mp_former_tpu.data.datasets.cityscapes_labels import INSTANCE_LABELS
from mp_former_tpu.evaluation.cityscapes_eval import \
    CityscapesInstanceEvaluator

from oracle_cityscapes import _image_instances, evaluate_images


def _rand_image(rng, H=64, W=64, n_inst=4, n_classes=3, group_p=0.2,
                void_p=0.5, small_p=0.25, n_pred=5, tie_scores=False):
    """Instance-id map in the cityscapes encoding + random predictions.
    Uses the first `n_classes` thing labels."""
    inst = np.zeros((H, W), np.int64)  # 0 = unlabeled -> void
    counters = {}
    for _ in range(rng.randint(1, n_inst + 1)):
        lab = INSTANCE_LABELS[rng.randint(0, n_classes)]
        y, x = rng.randint(0, H - 8), rng.randint(0, W - 8)
        if rng.rand() < small_p:
            h, w = rng.randint(3, 9), rng.randint(3, 9)  # < 100 px
        else:
            h = rng.randint(12, max(13, min(40, H - y)))
            w = rng.randint(12, max(13, min(40, W - x)))
        if rng.rand() < group_p:
            inst[y:y + h, x:x + w] = lab.id          # group region
        else:
            counters[lab.id] = counters.get(lab.id, 0) + 1
            inst[y:y + h, x:x + w] = lab.id * 1000 + counters[lab.id]
    if rng.rand() < void_p:
        y, x = rng.randint(0, H - 10), rng.randint(0, W - 10)
        inst[y:y + 10, x:x + 10] = 3  # labelId 3 = 'out of roi' (void)

    masks, scores, classes = [], [], []
    for _ in range(rng.randint(0, n_pred + 1)):
        m = np.zeros((H, W), bool)
        y, x = rng.randint(0, H - 8), rng.randint(0, W - 8)
        h = rng.randint(8, max(9, min(44, H - y)))
        w = rng.randint(8, max(9, min(44, W - x)))
        m[y:y + h, x:x + w] = True
        masks.append(m)
        scores.append(round(float(rng.rand()), 1) if tie_scores
                      else float(rng.rand()))
        classes.append(int(rng.randint(0, n_classes)))
    return inst, masks, np.asarray(scores), np.asarray(classes)


def _compare(images, seed):
    shipped = CityscapesInstanceEvaluator()
    oracle_imgs = []
    for inst, masks, scores, classes in images:
        shipped.process({}, scores, classes, masks, gt_instance_map=inst)
        oracle_imgs.append(_image_instances(inst, masks, scores, classes))
    got = shipped.evaluate()["segm"]
    want = evaluate_images(oracle_imgs)
    for k in want:
        a, b = got[k], want[k]
        if np.isnan(a) and np.isnan(b):
            continue
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-12,
                                   err_msg=f"seed={seed} {k}")


@pytest.mark.parametrize("seed", range(150))
def test_fuzz_cityscapes_instance(seed):
    rng = np.random.RandomState(seed)
    images = [_rand_image(rng) for _ in range(rng.randint(1, 4))]
    _compare(images, seed)


@pytest.mark.parametrize("seed", range(150, 250))
def test_fuzz_cityscapes_duplicates_and_ties(seed):
    """Many overlapping same-class predictions with tied scores: duplicate
    match demotion (max kept, min appended as FP) + stable sorting."""
    rng = np.random.RandomState(seed)
    images = [_rand_image(rng, n_pred=8, n_classes=2, tie_scores=True)
              for _ in range(2)]
    _compare(images, seed)


@pytest.mark.parametrize("seed", range(250, 350))
def test_fuzz_cityscapes_ignore_heavy(seed):
    """Group regions + void + small instances dominate: the FP-ignore
    proportion rule decides most unmatched predictions."""
    rng = np.random.RandomState(seed)
    images = [_rand_image(rng, group_p=0.5, small_p=0.5, void_p=0.9)
              for _ in range(2)]
    _compare(images, seed)


def test_perfect_prediction_is_ap100():
    inst = np.zeros((64, 64), np.int64)
    lab = INSTANCE_LABELS[0]
    inst[5:30, 5:30] = lab.id * 1000 + 1    # 625 px >= minRegionSize
    m = inst == lab.id * 1000 + 1
    images = [(inst, [m], np.asarray([0.9]), np.asarray([0]))]
    shipped = CityscapesInstanceEvaluator()
    shipped.process({}, images[0][2], images[0][3], images[0][1],
                    gt_instance_map=inst)
    got = shipped.evaluate()["segm"]
    want = evaluate_images([_image_instances(inst, [m], [0.9], [0])])
    assert abs(got["AP"] - 100) < 1e-9
    assert abs(want["AP"] - 100) < 1e-9
