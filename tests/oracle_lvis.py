"""Test-only oracle: structural port of the official lvis-api LVISEval on
top of the pycocotools-structured oracle (oracle_cocoeval.py). The lvis-api
copied pycocotools' greedy matcher and accumulate; its deltas are:

  * detections capped at max_dets per IMAGE across categories (LVISResults),
  * federated evaluation: (img, cat) pairs evaluated only when cat is in the
    image's positive set (has gt) or its neg_category_ids — everything else
    produces NO eval record (neither FP nor FN),
  * not_exhaustive_category_ids: unmatched dts of those cats on that image
    are ignored instead of counted FP,
  * no crowd gt; AP broken down by category frequency (APr/APc/APf).

Keep free of imports from mp_former_tpu.evaluation.
"""

from __future__ import annotations

import numpy as np

from oracle_cocoeval import AREA_RNG, COCOevalOracle


class LVISevalOracle(COCOevalOracle):
    def __init__(self, gts, dts, img_info, cat_freq, max_dets=300):
        """img_info: {image_id: {"neg": set, "not_exhaustive": set}};
        cat_freq: {category_id: 'r'|'c'|'f'}; dts capped per image here."""
        capped = []
        for img in {d["image_id"] for d in dts}:
            img_dts = [d for d in dts if d["image_id"] == img]
            order = np.argsort([-d["score"] for d in img_dts],
                               kind="mergesort")[:max_dets]
            capped.extend(img_dts[i] for i in order)
        super().__init__(gts, capped, "segm", max_dets=(max_dets,))
        self.img_info = img_info
        self.cat_freq = cat_freq
        # federated: the (img, cat) universe is pos | neg per image
        self._pos = {}
        for g in gts:
            self._pos.setdefault(g["image_id"], set()).add(g["category_id"])

    def _evaluated(self, imgId, catId):
        info = self.img_info.get(imgId, {})
        return (catId in self._pos.get(imgId, set())
                or catId in info.get("neg", set()))

    def evaluateImg(self, imgId, catId, aRng, maxDet, ious):
        if not self._evaluated(imgId, catId):
            return None
        out = super().evaluateImg(imgId, catId, aRng, maxDet, ious)
        if out is None:
            return None
        info = self.img_info.get(imgId, {})
        if catId in info.get("not_exhaustive", set()):
            # any unmatched dt is ignored, not FP
            out["dtIgnore"] = np.logical_or(out["dtIgnore"],
                                            out["dtMatches"] == 0)
        return out

    def summarize(self):
        res = super().summarize()
        p = self.eval["precision"]
        for key, freq in (("APr", "r"), ("APc", "c"), ("APf", "f")):
            kis = [ki for ki, c in enumerate(self.catIds)
                   if self.cat_freq.get(c) == freq]
            s = p[:, :, kis, 0, -1] if kis else np.array([])
            s = s[s > -1] if s.size else s
            res[key] = float(np.mean(s) * 100) if s.size else float("nan")
        return res
