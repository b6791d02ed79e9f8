"""Differential fuzz: shipped LVISEvaluator vs the lvis-api structural port
(tests/oracle_lvis.py) — federated category sets, not-exhaustive images,
the per-image cross-category max_dets cap, and the APr/APc/APf breakdown.
"""

import json

import numpy as np
import pytest

from mp_former_tpu.evaluation.lvis_eval import LVISEvaluator

from oracle_lvis import LVISevalOracle


def _rect_poly(x0, y0, x1, y1):
    return [float(x0), float(y0), float(x1), float(y0),
            float(x1), float(y1), float(x0), float(y1)]


def _rand_dataset(rng, tmp_path, n_imgs=3, n_cats=4, H=48, W=48):
    """LVIS-style json + records + predictions. Categories get random
    frequency buckets; images get random neg / not_exhaustive sets."""
    freqs = [rng.choice(["r", "c", "f"]) for _ in range(n_cats)]
    categories = [{"id": c + 1, "name": f"c{c}", "frequency": freqs[c]}
                  for c in range(n_cats)]
    images, records, gts_oracle = [], [], []
    from mp_former_tpu.data.transforms import polygons_to_bitmask

    for img in range(n_imgs):
        anns = []
        pos = set()
        for _ in range(rng.randint(0, 4)):
            x0, y0 = rng.randint(0, W - 10), rng.randint(0, H - 10)
            x1 = x0 + rng.randint(4, min(24, W - x0))
            y1 = y0 + rng.randint(4, min(24, H - y0))
            cat = int(rng.randint(1, n_cats + 1))
            pos.add(cat)
            poly = _rect_poly(x0, y0, x1, y1)
            m = polygons_to_bitmask([np.asarray(poly)], H, W)
            area = float(m.sum())
            # records carry CONTIGUOUS 0-based ids (register_coco_instances
            # remaps); the oracle keeps raw 1-based ids internally
            anns.append({"category_id": cat - 1, "segmentation": [poly],
                         "area": area})
            gts_oracle.append({"image_id": img, "category_id": cat,
                               "mask": m, "area": area, "iscrowd": 0})
        remaining = [c + 1 for c in range(n_cats) if c + 1 not in pos]
        rng.shuffle(remaining)
        neg = set(remaining[:rng.randint(0, len(remaining) + 1)])
        nel = {c for c in pos if rng.rand() < 0.35}
        images.append({"id": img, "height": H, "width": W,
                       "neg_category_ids": sorted(neg),
                       "not_exhaustive_category_ids": sorted(nel)})
        records.append({"image_id": img, "height": H, "width": W,
                        "annotations": anns})
    jf = tmp_path / "lvis.json"
    jf.write_text(json.dumps({"images": images, "categories": categories,
                              "annotations": []}))

    preds = {}
    dts_oracle = []
    for img in range(n_imgs):
        masks, scores, classes = [], [], []
        for _ in range(rng.randint(0, 6)):
            m = np.zeros((H, W), bool)
            y, x = rng.randint(0, H - 6), rng.randint(0, W - 6)
            h = rng.randint(4, max(5, min(26, H - y)))
            w = rng.randint(4, max(5, min(26, W - x)))
            m[y:y + h, x:x + w] = True
            cat = int(rng.randint(1, n_cats + 1))
            score = float(rng.rand())
            masks.append(m)
            scores.append(score)
            # shipped process() takes CONTIGUOUS 0-based class ids
            classes.append(cat - 1)
            dts_oracle.append({"image_id": img, "category_id": cat,
                               "mask": m, "score": score})
        preds[img] = (np.asarray(scores), np.asarray(classes), masks)

    img_info = {img["id"]: {"neg": set(img["neg_category_ids"]),
                            "not_exhaustive":
                                set(img["not_exhaustive_category_ids"])}
                for img in images}
    cat_freq = {c + 1: freqs[c] for c in range(n_cats)}
    return str(jf), records, preds, gts_oracle, dts_oracle, img_info, cat_freq


def _compare(rng, tmp_path, seed, max_dets=300):
    (jf, records, preds, gts_o, dts_o,
     img_info, cat_freq) = _rand_dataset(rng, tmp_path)
    if not gts_o:
        return
    shipped = LVISEvaluator(records, jf, max_dets=max_dets)
    for img, (scores, classes, masks) in preds.items():
        shipped.process(img, scores, classes, masks)
    got = shipped.evaluate()["segm"]

    # the oracle judges only federated (img, cat) pairs; restrict its
    # det/gt universe identically
    oracle = LVISevalOracle(gts_o, dts_o, img_info, cat_freq,
                            max_dets=max_dets)
    oracle.evaluate()
    oracle.accumulate()
    want = oracle.summarize()
    for k in ("AP", "AP50", "AP75", "APs", "APm", "APl",
              "APr", "APc", "APf"):
        a, b = got[k], want[k]
        if np.isnan(a) and np.isnan(b):
            continue
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-9,
                                   err_msg=f"seed={seed} {k}")


@pytest.mark.parametrize("seed", range(120))
def test_fuzz_lvis(seed, tmp_path):
    rng = np.random.RandomState(seed)
    _compare(rng, tmp_path, seed)


@pytest.mark.parametrize("seed", range(120, 180))
def test_fuzz_lvis_tiny_maxdets(seed, tmp_path):
    """max_dets below the per-image det count exercises the cross-category
    per-image cap (COCO caps per category instead)."""
    rng = np.random.RandomState(seed)
    _compare(rng, tmp_path, seed, max_dets=3)
