#!/usr/bin/env python
"""PQ for semantic-segmentation predictions (reference
tools/evaluate_pq_for_semantic_segmentation.py:21-40).

Treats each connected class region... following the reference: each CLASS
present forms one segment per map (stuff-style PQ). Reads prediction pngs and
GT pngs with class ids.

Usage: python tools/evaluate_pq_for_semantic_segmentation.py \
  --pred-dir preds/ --gt-dir gts/ [--num-classes 150] [--ignore 255]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pred-dir", required=True)
    p.add_argument("--gt-dir", required=True)
    p.add_argument("--num-classes", type=int, default=150)
    p.add_argument("--ignore", type=int, default=255)
    args = p.parse_args()

    from mp_former_tpu.evaluation.panoptic_eval import PanopticEvaluator

    ev = PanopticEvaluator()
    n = 0
    for fname in sorted(os.listdir(args.pred_dir)):
        gt_path = os.path.join(args.gt_dir, fname)
        if not os.path.exists(gt_path):
            continue
        pred = cv2.imread(os.path.join(args.pred_dir, fname), cv2.IMREAD_UNCHANGED)
        gt = cv2.imread(gt_path, cv2.IMREAD_UNCHANGED)
        if pred.ndim == 3:
            pred = pred[..., 0]
        if gt.ndim == 3:
            gt = gt[..., 0]
        # one segment per present class; void/ignore -> 0
        def to_segments(m):
            seg_map = np.zeros(m.shape, np.int64)
            segments = []
            for c in np.unique(m):
                if c == args.ignore or c >= args.num_classes:
                    continue
                sid = int(c) + 1
                seg_map[m == c] = sid
                segments.append({"id": sid, "category_id": int(c), "iscrowd": 0})
            return seg_map, segments

        pm, ps = to_segments(pred)
        gm, gs = to_segments(gt)
        ev.process(pm, ps, gm, gs)
        n += 1
    print(f"evaluated {n} maps")
    print(ev.evaluate())


if __name__ == "__main__":
    main()
