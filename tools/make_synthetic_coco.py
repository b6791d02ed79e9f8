#!/usr/bin/env python
"""Generate a learnable synthetic COCO-format instance dataset.

No real COCO is reachable from this environment, so training-evidence runs
(PERFORMANCE.md loss curves) use this: colored shapes (class = color/shape
combination) on textured backgrounds, with exact polygon segmentations in
the standard COCO layout that the LSJ mapper consumes unchanged.

Usage: python tools/make_synthetic_coco.py --root /tmp/synth_coco
       [--images 200] [--size 640] [--classes 20]
"""

import argparse
import json
import os

import cv2
import numpy as np


def class_color(c: int, num_classes: int) -> np.ndarray:
    """Distinct saturated BGR color per class (hue-coded so the class is
    learnable from appearance)."""
    hue = int(179 * c / max(num_classes, 1))
    hsv = np.uint8([[[hue, 230, 220]]])
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)[0, 0].astype(np.int32)


def ellipse_polygon(cx, cy, ax, ay, angle, k=16):
    ts = np.linspace(0, 2 * np.pi, k, endpoint=False)
    ca, sa = np.cos(angle), np.sin(angle)
    xs = cx + ax * np.cos(ts) * ca - ay * np.sin(ts) * sa
    ys = cy + ax * np.cos(ts) * sa + ay * np.sin(ts) * ca
    return np.stack([xs, ys], -1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--images", type=int, default=200)
    p.add_argument("--size", type=int, default=640)
    p.add_argument("--classes", type=int, default=20)
    p.add_argument("--split", default="train2017")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--panoptic", action="store_true",
                   help="also write panoptic_{split}/ id PNGs + json "
                        "(things = the shape classes, one 'background' "
                        "stuff class)")
    args = p.parse_args()

    img_dir = os.path.join(args.root, "coco", args.split)
    ann_dir = os.path.join(args.root, "coco", "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)
    pan_dir = os.path.join(args.root, "coco", f"panoptic_{args.split}")
    if args.panoptic:
        os.makedirs(pan_dir, exist_ok=True)
    pan_annotations = []

    rng = np.random.RandomState(args.seed)
    s = args.size
    images, annotations = [], []
    aid = 1
    for i in range(args.images):
        # textured background: low-frequency noise
        noise = rng.rand(s // 16, s // 16, 3)
        bg = cv2.resize((noise * 80 + 40).astype(np.uint8), (s, s),
                        interpolation=cv2.INTER_CUBIC)
        img = bg.copy()
        # panoptic id map: segment id encoded as R + 256G + 65536B; the
        # whole background is one stuff segment (id 1)
        pan_ids = np.ones((s, s), np.int64)
        segments_info = [None]  # placeholder; filled after objects painted
        next_sid = 2
        n_obj = rng.randint(3, 9)
        for _ in range(n_obj):
            c = int(rng.randint(args.classes))
            color = class_color(c, args.classes)
            jitter = rng.randint(-25, 26, 3)
            col = tuple(int(v) for v in np.clip(color + jitter, 0, 255))
            cx, cy = rng.randint(s // 8, 7 * s // 8, 2)
            ax_, ay_ = rng.randint(s // 20, s // 5, 2)
            ang = rng.rand() * np.pi
            if c % 2 == 0:  # even classes: ellipses
                pts = ellipse_polygon(cx, cy, ax_, ay_, ang)
            else:           # odd classes: rotated rectangles
                box = cv2.boxPoints(((float(cx), float(cy)),
                                     (float(ax_ * 2), float(ay_ * 2)),
                                     float(np.degrees(ang))))
                pts = np.asarray(box, np.float64)
            pts[:, 0] = np.clip(pts[:, 0], 0, s - 1)
            pts[:, 1] = np.clip(pts[:, 1], 0, s - 1)
            x0, y0 = pts.min(0)
            x1, y1 = pts.max(0)
            if (x1 - x0) < 4 or (y1 - y0) < 4:
                # check BEFORE painting: a painted-but-unannotated object
                # would be GT noise (visible shape labeled background)
                continue
            cv2.fillPoly(img, [pts.astype(np.int32)], col)
            mask = np.zeros((s, s), np.uint8)
            cv2.fillPoly(mask, [pts.astype(np.int32)], 1)
            if args.panoptic:
                pan_ids[mask.astype(bool)] = next_sid
                segments_info.append({
                    "id": next_sid, "category_id": c + 1, "iscrowd": 0,
                    "area": float(mask.sum()),
                    "bbox": [float(x0), float(y0),
                             float(x1 - x0), float(y1 - y0)],
                })
                next_sid += 1
            annotations.append({
                "id": aid, "image_id": i + 1, "category_id": c + 1,
                "bbox": [float(x0), float(y0), float(x1 - x0), float(y1 - y0)],
                "area": float(mask.sum()), "iscrowd": 0,
                "segmentation": [pts.reshape(-1).tolist()],
            })
            aid += 1
        fn = f"{i + 1:012d}.jpg"
        cv2.imwrite(os.path.join(img_dir, fn), img)
        images.append({"id": i + 1, "file_name": fn, "height": s, "width": s})
        if args.panoptic:
            # recompute per-segment areas after occlusion by later objects
            segs = []
            ids, counts = np.unique(pan_ids, return_counts=True)
            area_of = dict(zip(ids.tolist(), counts.tolist()))
            bg_cat = args.classes + 1  # the one stuff class
            segs.append({"id": 1, "category_id": bg_cat, "iscrowd": 0,
                         "area": float(area_of.get(1, 0)),
                         "bbox": [0.0, 0.0, float(s), float(s)]})
            for si in segments_info[1:]:
                if area_of.get(si["id"], 0) == 0:
                    continue  # fully occluded
                si = dict(si, area=float(area_of[si["id"]]))
                segs.append(si)
            png = np.zeros((s, s, 3), np.uint8)
            png[:, :, 0] = pan_ids % 256          # R (rgb2id order)
            png[:, :, 1] = (pan_ids // 256) % 256
            png[:, :, 2] = pan_ids // 65536
            pfn = f"{i + 1:012d}.png"
            cv2.imwrite(os.path.join(pan_dir, pfn), png[:, :, ::-1])  # BGR
            pan_annotations.append({
                "image_id": i + 1, "file_name": pfn,
                "segments_info": segs})

    data = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": c + 1, "name": f"shape-{c}"} for c in range(args.classes)
        ],
    }
    out = os.path.join(ann_dir, f"instances_{args.split}.json")
    with open(out, "w") as f:
        json.dump(data, f)
    print(f"{len(images)} images, {len(annotations)} annotations -> {out}")

    if args.panoptic:
        pan = {
            "images": images,
            "annotations": pan_annotations,
            "categories": [
                {"id": c + 1, "name": f"shape-{c}", "isthing": 1}
                for c in range(args.classes)
            ] + [{"id": args.classes + 1, "name": "background", "isthing": 0}],
        }
        pout = os.path.join(ann_dir, f"panoptic_{args.split}.json")
        with open(pout, "w") as f:
            json.dump(pan, f)
        print(f"panoptic: {len(pan_annotations)} annotations -> {pout}")


if __name__ == "__main__":
    main()
