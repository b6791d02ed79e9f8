"""Differential fuzz: shipped numpy COCOeval vs an independent pycocotools
structural port (tests/oracle_cocoeval.py).

Every AP number the project reports rests on evaluation/coco_eval.py
(pycocotools itself is not installed — reference scores via d2's
COCOEvaluator/pycocotools, train_net.py:142-222). Randomized predictions
cover the classic drift spots: score ties, crowd+area interaction, maxDets
truncation order, 101-point interpolation boundaries, empty images, dets
without gts and vice versa.
"""

import numpy as np
import pytest

from mp_former_tpu.evaluation.coco_eval import CocoAPEvaluator

from oracle_cocoeval import COCOevalOracle


def _rand_case(rng, H=24, W=24, n_imgs=3, n_cats=2, max_gt=4, max_dt=6,
               tie_scores=False, crowd_p=0.25, max_dets=100):
    """Random dense-mask gts/dts for a few images and categories."""
    gts, dts = [], []
    for img in range(n_imgs):
        for _ in range(rng.randint(0, max_gt + 1)):
            m = np.zeros((H, W), bool)
            y, x = rng.randint(0, H - 4), rng.randint(0, W - 4)
            h, w = rng.randint(2, H - y), rng.randint(2, W - x)
            m[y:y + h, x:x + w] = True
            gts.append({
                "image_id": img,
                "category_id": int(rng.randint(1, n_cats + 1)),
                "mask": m,
                # area from the source polygon can disagree with the raster;
                # fuzz that too by jittering
                "area": float(m.sum() * rng.uniform(0.8, 1.2)),
                "iscrowd": int(rng.rand() < crowd_p),
            })
        for _ in range(rng.randint(0, max_dt + 1)):
            m = np.zeros((H, W), bool)
            y, x = rng.randint(0, H - 4), rng.randint(0, W - 4)
            h, w = rng.randint(2, H - y), rng.randint(2, W - x)
            m[y:y + h, x:x + w] = True
            score = (round(float(rng.rand()), 1) if tie_scores
                     else float(rng.rand()))
            dts.append({
                "image_id": img,
                "category_id": int(rng.randint(1, n_cats + 1)),
                "mask": m, "score": score,
            })
    return gts, dts


def _run_shipped(gts, dts, max_dets=100):
    ev = CocoAPEvaluator("segm", max_dets=max_dets)
    imgs = sorted({a["image_id"] for a in gts} | {a["image_id"] for a in dts})
    for img in imgs:
        g = [a for a in gts if a["image_id"] == img]
        d = [a for a in dts if a["image_id"] == img]
        ev.add_image(
            det_scores=np.array([a["score"] for a in d], np.float64),
            det_cats=np.array([a["category_id"] for a in d], np.int64),
            det_masks_or_boxes=[a["mask"] for a in d],
            gt_cats=np.array([a["category_id"] for a in g], np.int64),
            gt_masks_or_boxes=[a["mask"] for a in g],
            gt_iscrowd=np.array([a["iscrowd"] for a in g], bool),
            gt_areas=np.array([a["area"] for a in g], np.float64),
        )
    return ev.summarize(), ev.per_category_ap()


def _run_oracle(gts, dts, max_dets=100):
    o = COCOevalOracle(gts, dts, "segm", max_dets=(max_dets,))
    o.evaluate()
    o.accumulate()
    return o.summarize()


def _compare(gts, dts, seed, max_dets=100):
    if not gts:
        return  # no GT at all: both define nothing; skip
    s, per_cat = _run_shipped(gts, dts, max_dets)
    o = _run_oracle(gts, dts, max_dets)
    for k in ("AP", "AP50", "AP75", "APs", "APm", "APl"):
        a, b = s[k], o[k]
        if np.isnan(a) and np.isnan(b):
            continue
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-9,
                                   err_msg=f"seed={seed} metric={k}")
    for c, ap in per_cat.items():
        b = o.get(f"AP-cat{c}", float("nan"))
        if np.isnan(ap) and np.isnan(b):
            continue
        np.testing.assert_allclose(ap, b, rtol=1e-9, atol=1e-9,
                                   err_msg=f"seed={seed} cat={c}")


@pytest.mark.parametrize("seed", range(250))
def test_fuzz_general(seed):
    rng = np.random.RandomState(seed)
    gts, dts = _rand_case(rng)
    _compare(gts, dts, seed)


@pytest.mark.parametrize("seed", range(250, 450))
def test_fuzz_score_ties(seed):
    """Scores quantized to 1 decimal: heavy ties exercise mergesort
    stability in both per-image and global accumulate sorts."""
    rng = np.random.RandomState(seed)
    gts, dts = _rand_case(rng, tie_scores=True, max_dt=8)
    _compare(gts, dts, seed)


@pytest.mark.parametrize("seed", range(450, 650))
def test_fuzz_crowd_heavy(seed):
    """Half the gts crowd: multi-match + det-area IoU denominator +
    crowd-vs-arearange ignore interaction."""
    rng = np.random.RandomState(seed)
    gts, dts = _rand_case(rng, crowd_p=0.5, max_gt=6)
    _compare(gts, dts, seed)


@pytest.mark.parametrize("seed", range(650, 800))
def test_fuzz_maxdets_truncation(seed):
    """maxDets smaller than the det count: truncation happens per (img, cat)
    in score order BEFORE matching."""
    rng = np.random.RandomState(seed)
    gts, dts = _rand_case(rng, max_dt=10, tie_scores=True)
    _compare(gts, dts, seed, max_dets=3)


@pytest.mark.parametrize("seed", range(800, 900))
def test_fuzz_area_ranges(seed):
    """Tiny and huge masks around the 32^2 / 96^2 boundaries (on a larger
    canvas so 'medium'/'large' are reachable)."""
    rng = np.random.RandomState(seed)
    gts, dts = [], []
    for img in range(2):
        for _ in range(rng.randint(1, 4)):
            m = np.zeros((128, 128), bool)
            side = int(rng.choice([5, 31, 32, 33, 95, 96, 97, 120]))
            y = rng.randint(0, 128 - side)
            x = rng.randint(0, 128 - side)
            m[y:y + side, x:x + side] = True
            gts.append({"image_id": img, "category_id": 1, "mask": m,
                        "area": float(m.sum()),
                        "iscrowd": int(rng.rand() < 0.2)})
        for _ in range(rng.randint(0, 5)):
            m = np.zeros((128, 128), bool)
            side = int(rng.choice([5, 31, 32, 33, 95, 96, 97, 120]))
            y = rng.randint(0, 128 - side)
            x = rng.randint(0, 128 - side)
            m[y:y + side, x:x + side] = True
            dts.append({"image_id": img, "category_id": 1, "mask": m,
                        "score": float(rng.rand())})
    _compare(gts, dts, seed)


def test_empty_images_and_one_sided():
    """Images with no dets, no gts, or neither, mixed with normal ones."""
    rng = np.random.RandomState(12345)
    gts, dts = _rand_case(rng, n_imgs=2)
    # image 5: gt only; image 6: det only; image 7 in neither list
    m = np.zeros((24, 24), bool)
    m[2:10, 2:10] = True
    gts.append({"image_id": 5, "category_id": 1, "mask": m,
                "area": 64.0, "iscrowd": 0})
    dts.append({"image_id": 6, "category_id": 2, "mask": m, "score": 0.9})
    _compare(gts, dts, 12345)


def test_perfect_predictions_give_ap100():
    m1 = np.zeros((24, 24), bool)
    m1[2:10, 2:10] = True
    m2 = np.zeros((24, 24), bool)
    m2[12:20, 12:20] = True
    gts = [{"image_id": 0, "category_id": 1, "mask": m1, "area": 64.0,
            "iscrowd": 0},
           {"image_id": 0, "category_id": 1, "mask": m2, "area": 64.0,
            "iscrowd": 0}]
    dts = [{"image_id": 0, "category_id": 1, "mask": m1, "score": 0.9},
           {"image_id": 0, "category_id": 1, "mask": m2, "score": 0.8}]
    s, _ = _run_shipped(gts, dts)
    o = _run_oracle(gts, dts)
    assert abs(s["AP"] - 100.0) < 1e-9
    assert abs(o["AP"] - 100.0) < 1e-9
