"""LVIS federated-evaluation semantics (evaluation/lvis_eval.py;
reference routes evaluator_type 'lvis' to d2 LVISEvaluator,
train_net.py:214-215)."""

import json

import numpy as np
import pytest

from mp_former_tpu.evaluation.lvis_eval import LVISEvaluator


def _square_poly(x0, y0, x1, y1):
    return [x0, y0, x1, y0, x1, y1, x0, y1]


def _mask(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), bool)
    m[y0:y1, x0:x1] = True
    return m


@pytest.fixture
def lvis_ds(tmp_path):
    """2 images; cat 1 'r', cat 2 'c', cat 3 'f'.
    img1: gt cat1; cat2 in neg list; cat3 unlisted (federated-ignored).
    img2: gt cat3; cat1 not_exhaustive (and has one gt cat1)."""
    data = {
        "categories": [
            {"id": 1, "name": "rare-thing", "frequency": "r"},
            {"id": 2, "name": "common-thing", "frequency": "c"},
            {"id": 3, "name": "freq-thing", "frequency": "f"},
        ],
        "images": [
            {"id": 1, "height": 64, "width": 64,
             "neg_category_ids": [2], "not_exhaustive_category_ids": []},
            {"id": 2, "height": 64, "width": 64,
             "neg_category_ids": [], "not_exhaustive_category_ids": [1]},
        ],
    }
    jf = tmp_path / "lvis.json"
    jf.write_text(json.dumps(data))
    records = [
        {"image_id": 1, "height": 64, "width": 64, "annotations": [
            {"category_id": 0, "area": 400,
             "segmentation": [_square_poly(10, 10, 30, 30)]},
        ]},
        {"image_id": 2, "height": 64, "width": 64, "annotations": [
            {"category_id": 2, "area": 400,
             "segmentation": [_square_poly(10, 10, 30, 30)]},
            {"category_id": 0, "area": 100,
             "segmentation": [_square_poly(40, 40, 50, 50)]},
        ]},
    ]
    return records, str(jf)


def test_federated_unlisted_category_ignored(lvis_ds):
    """A cat-3 detection on img1 (cat3 neither pos nor neg) must not hurt."""
    records, jf = lvis_ds
    ev = LVISEvaluator(records, jf)
    gt_mask = _mask(64, 64, 10, 30, 10, 30)
    # img1: perfect cat1 match + spurious cat3 det (federated-ignored)
    ev.process(1, np.array([0.9, 0.8]), np.array([0, 2]),
               [gt_mask, _mask(64, 64, 40, 60, 40, 60)])
    # img2: perfect cat3 match + matching cat1 det (not_exhaustive img)
    ev.process(2, np.array([0.9, 0.9]), np.array([2, 0]),
               [gt_mask, _mask(64, 64, 40, 50, 40, 50)])
    res = ev.evaluate()["segm"]
    assert abs(res["AP"] - 100.0) < 1e-6
    assert abs(res["APr"] - 100.0) < 1e-6
    assert abs(res["APf"] - 100.0) < 1e-6
    assert np.isnan(res["APc"])  # no cat2 GT anywhere


def test_neg_category_detection_is_fp(lvis_ds):
    """cat2 is in img1's neg list: a cat2 det there is a real FP... but AP
    for cat2 has no GT -> excluded; instead check it does not crash and that
    a cat1 FP on img1 drags cat1 AP down."""
    records, jf = lvis_ds
    ev = LVISEvaluator(records, jf)
    gt_mask = _mask(64, 64, 10, 30, 10, 30)
    ev.process(1, np.array([0.9, 0.95]), np.array([0, 0]),
               [gt_mask, _mask(64, 64, 40, 60, 40, 60)])  # higher-score FP
    res = ev.evaluate()["segm"]
    assert res["APr"] < 100.0  # FP outranks the TP


def test_not_exhaustive_unmatched_det_ignored(lvis_ds):
    """img2 lists cat1 as not-exhaustive: an unmatched cat1 det there is
    ignored, so cat1 AP stays 100."""
    records, jf = lvis_ds
    ev = LVISEvaluator(records, jf)
    gt_mask = _mask(64, 64, 10, 30, 10, 30)
    ev.process(1, np.array([0.9]), np.array([0]), [gt_mask])
    ev.process(2, np.array([0.9, 0.95, 0.99]), np.array([2, 0, 0]),
               [gt_mask, _mask(64, 64, 40, 50, 40, 50),
                _mask(64, 64, 55, 60, 0, 60)])  # last: unmatched cat1
    res = ev.evaluate()["segm"]
    assert abs(res["APr"] - 100.0) < 1e-6


def test_max_dets_image_level_cap(lvis_ds):
    records, jf = lvis_ds
    ev = LVISEvaluator(records, jf, max_dets=1)
    gt_mask = _mask(64, 64, 10, 30, 10, 30)
    # the real match has LOWER score than a federated-ignored cat3 det, so
    # the image-level cap of 1 drops the cat1 match entirely -> recall 0
    ev.process(1, np.array([0.5, 0.8]), np.array([0, 2]),
               [gt_mask, _mask(64, 64, 40, 60, 40, 60)])
    res = ev.evaluate()["segm"]
    assert res["AP"] < 1e-6
