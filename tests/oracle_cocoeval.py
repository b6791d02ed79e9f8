"""Test-only oracle: a structural port of pycocotools COCOeval.

pycocotools is not installed in this image; the shipped evaluator
(mp_former_tpu/evaluation/coco_eval.py) is a from-scratch numpy
reimplementation of the algorithm. This module is an INDEPENDENT second
implementation that mirrors the ORIGINAL pycocotools code structure
(cocoeval.py: _prepare -> evaluateImg per (img, cat, area, maxDet) ->
accumulate over the -1-initialized (T, R, K, A, M) arrays -> summarize),
including its quirks:

  * mergesort everywhere ties matter,
  * iou = min(t, 1-1e-10) match floor and "later gt wins ties",
  * crowd gts matchable by multiple dts, iou denominator = det area,
  * ignored gts sorted last, a dt matched to a non-ignored gt never
    downgraded to an ignored one,
  * unmatched dts outside the area range ignored,
  * precision envelope (backward max) + searchsorted(left) 101-pt sampling.

Used by tests/test_cocoeval_differential.py to fuzz the shipped evaluator;
keep this file free of imports from mp_former_tpu.evaluation.
"""

from __future__ import annotations

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNG = [(0.0, 1e10), (0.0, 32.0 ** 2), (32.0 ** 2, 96.0 ** 2),
            (96.0 ** 2, 1e10)]
AREA_LBL = ["all", "small", "medium", "large"]


def _iou(d_masks, g_masks, iscrowd):
    """pycocotools maskUtils.iou semantics on dense bool masks."""
    D, G = len(d_masks), len(g_masks)
    out = np.zeros((D, G), np.float64)
    for di in range(D):
        dm = d_masks[di].astype(bool)
        da = dm.sum()
        for gi in range(G):
            gm = g_masks[gi].astype(bool)
            i = np.logical_and(dm, gm).sum()
            u = da if iscrowd[gi] else da + gm.sum() - i
            out[di, gi] = i / u if u > 0 else 0.0
    return out


def _iou_box(d, g, iscrowd):
    D, G = len(d), len(g)
    out = np.zeros((D, G), np.float64)
    for di in range(D):
        dx, dy, dw, dh = d[di]
        da = dw * dh
        for gi in range(G):
            gx, gy, gw, gh = g[gi]
            iw = min(dx + dw, gx + gw) - max(dx, gx)
            ih = min(dy + dh, gy + gh) - max(dy, gy)
            i = max(iw, 0) * max(ih, 0)
            u = da if iscrowd[gi] else da + gw * gh - i
            out[di, gi] = i / u if u > 0 else 0.0
    return out


class COCOevalOracle:
    """Operates on plain dict annotations:

    gt ann: {image_id, category_id, area, iscrowd, mask (H,W) bool | bbox}
    dt ann: {image_id, category_id, score, mask | bbox}
    """

    def __init__(self, gts, dts, iou_type="segm", max_dets=(100,)):
        self.iou_type = iou_type
        self.maxDets = list(max_dets)
        self.imgIds = sorted({a["image_id"] for a in gts}
                             | {a["image_id"] for a in dts})
        self.catIds = sorted({a["category_id"] for a in gts}
                             | {a["category_id"] for a in dts})
        self._gts = {}
        self._dts = {}
        for img in self.imgIds:
            for cat in self.catIds:
                self._gts[img, cat] = [a for a in gts
                                       if a["image_id"] == img
                                       and a["category_id"] == cat]
                self._dts[img, cat] = [a for a in dts
                                       if a["image_id"] == img
                                       and a["category_id"] == cat]
        self.evalImgs = None
        self.eval = None

    def computeIoU(self, imgId, catId):
        gt = self._gts[imgId, catId]
        dt = self._dts[imgId, catId]
        if len(gt) == 0 or len(dt) == 0:
            return []
        inds = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in inds]
        if len(dt) > self.maxDets[-1]:
            dt = dt[0:self.maxDets[-1]]
        iscrowd = [int(o["iscrowd"]) for o in gt]
        if self.iou_type == "segm":
            return _iou([d["mask"] for d in dt], [g["mask"] for g in gt],
                        iscrowd)
        return _iou_box([d["bbox"] for d in dt], [g["bbox"] for g in gt],
                        iscrowd)

    def evaluateImg(self, imgId, catId, aRng, maxDet, ious):
        gt = self._gts[imgId, catId]
        dt = self._dts[imgId, catId]
        if len(gt) == 0 and len(dt) == 0:
            return None
        for g in gt:
            g["_ignore"] = 1 if (g["iscrowd"] or g["area"] < aRng[0]
                                 or g["area"] > aRng[1]) else 0
        gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dtind[0:maxDet]]
        iscrowd = [int(o["iscrowd"]) for o in gt]
        ious = (ious[:, gtind] if len(ious) > 0 else ious)

        T = len(IOU_THRS)
        G = len(gt)
        D = len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gtIg = np.array([g["_ignore"] for g in gt])
        dtIg = np.zeros((T, D))
        if len(ious) != 0:
            for tind, t in enumerate(IOU_THRS):
                for dind, d in enumerate(dt):
                    iou = min([t, 1 - 1e-10])
                    m = -1
                    for gind, g in enumerate(gt):
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                            break
                        if ious[dind, gind] < iou:
                            continue
                        iou = ious[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dtIg[tind, dind] = gtIg[m]
                    dtm[tind, dind] = 1 + m        # gt id stand-in (nonzero)
                    gtm[tind, m] = 1 + dind
        if self.iou_type == "segm":
            a = np.array([d["mask"].sum() < aRng[0]
                          or d["mask"].sum() > aRng[1] for d in dt])
        else:
            a = np.array([d["bbox"][2] * d["bbox"][3] < aRng[0]
                          or d["bbox"][2] * d["bbox"][3] > aRng[1]
                          for d in dt])
        a = a.reshape((1, len(dt)))
        dtIg = np.logical_or(dtIg, np.logical_and(
            dtm == 0, np.repeat(a, T, 0)))
        return {
            "dtMatches": dtm,
            "dtScores": [d["score"] for d in dt],
            "gtIgnore": gtIg,
            "dtIgnore": dtIg,
        }

    def evaluate(self):
        self.ious = {(imgId, catId): self.computeIoU(imgId, catId)
                     for imgId in self.imgIds for catId in self.catIds}
        maxDet = self.maxDets[-1]
        self.evalImgs = [
            self.evaluateImg(imgId, catId, aRng, maxDet,
                             self.ious[imgId, catId])
            for catId in self.catIds
            for aRng in AREA_RNG
            for imgId in self.imgIds
        ]

    def accumulate(self):
        T = len(IOU_THRS)
        R = len(REC_THRS)
        K = len(self.catIds)
        A = len(AREA_RNG)
        M = len(self.maxDets)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        I0 = len(self.imgIds)
        A0 = len(AREA_RNG)
        for k in range(K):
            Nk = k * A0 * I0
            for a in range(A):
                Na = a * I0
                for m, maxDet in enumerate(self.maxDets):
                    E = [self.evalImgs[Nk + Na + i] for i in range(I0)]
                    E = [e for e in E if e is not None]
                    if len(E) == 0:
                        continue
                    dtScores = np.concatenate(
                        [e["dtScores"][0:maxDet] for e in E])
                    inds = np.argsort(-dtScores, kind="mergesort")
                    dtm = np.concatenate(
                        [e["dtMatches"][:, 0:maxDet] for e in E],
                        axis=1)[:, inds]
                    dtIg = np.concatenate(
                        [e["dtIgnore"][:, 0:maxDet] for e in E],
                        axis=1)[:, inds]
                    gtIg = np.concatenate([e["gtIgnore"] for e in E])
                    npig = np.count_nonzero(gtIg == 0)
                    if npig == 0:
                        continue
                    tps = np.logical_and(dtm, np.logical_not(dtIg))
                    fps = np.logical_and(np.logical_not(dtm),
                                         np.logical_not(dtIg))
                    tp_sum = np.cumsum(tps, axis=1).astype(dtype=np.float64)
                    fp_sum = np.cumsum(fps, axis=1).astype(dtype=np.float64)
                    for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / (fp + tp + np.spacing(1))
                        q = np.zeros((R,))
                        recall[t, k, a, m] = rc[-1] if nd else 0
                        pr = pr.tolist()
                        q = q.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds2 = np.searchsorted(rc, REC_THRS, side="left")
                        for ri, pi in enumerate(inds2):
                            try:
                                q[ri] = pr[pi]
                            except IndexError:
                                pass
                        precision[t, :, k, a, m] = np.array(q)
        self.eval = {"precision": precision, "recall": recall}

    def summarize(self):
        """Returns the d2/reference metric dict (AP, AP50, AP75, APs/m/l)."""
        p = self.eval["precision"]
        mind = self.maxDets.index(self.maxDets[-1])

        def ap(iouThr=None, area="all"):
            a = AREA_LBL.index(area)
            s = p[:, :, :, a, mind]
            if iouThr is not None:
                t = np.where(np.isclose(IOU_THRS, iouThr))[0]
                s = s[t]
            s = s[s > -1]
            return float(np.mean(s) * 100) if s.size else float("nan")

        res = {"AP": ap(), "AP50": ap(0.5), "AP75": ap(0.75),
               "APs": ap(area="small"), "APm": ap(area="medium"),
               "APl": ap(area="large")}
        # per-category AP over 'all' (d2 _derive_coco_results "AP-<cat>")
        for ki, c in enumerate(self.catIds):
            s = p[:, :, ki, 0, mind]
            s = s[s > -1]
            res[f"AP-cat{c}"] = float(np.mean(s) * 100) if s.size \
                else float("nan")
        return res
