#!/usr/bin/env python
"""Generate a learnable synthetic YTVIS-format video instance dataset.

No real YouTube-VIS is reachable from this environment, so video
training-evidence runs use this: colored shapes (class = color/shape
combination, like tools/make_synthetic_coco.py) that MOVE smoothly across
frames on textured backgrounds, with exact per-frame polygon segmentations
in the standard YTVIS layout (reference data_video dataset format).

Usage: python tools/make_synthetic_ytvis.py --root /tmp/synth
       [--videos 40] [--frames 8] [--size 320] [--classes 10]
"""

import argparse
import json
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_synthetic_coco import class_color, ellipse_polygon  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--videos", type=int, default=40)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--size", type=int, default=320)
    p.add_argument("--classes", type=int, default=10)
    p.add_argument("--split", default="train")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    base = os.path.join(args.root, "ytvis_2019")
    img_root = os.path.join(base, args.split, "JPEGImages")
    os.makedirs(img_root, exist_ok=True)

    rng = np.random.RandomState(args.seed)
    s = args.size
    videos, annotations = [], []
    aid = 1
    for vi in range(args.videos):
        vdir = f"v{vi + 1:04d}"
        os.makedirs(os.path.join(img_root, vdir), exist_ok=True)
        noise = rng.rand(s // 16, s // 16, 3)
        bg = cv2.resize((noise * 80 + 40).astype(np.uint8), (s, s),
                        interpolation=cv2.INTER_CUBIC)

        # objects: class, color, start center, velocity, half-axes, angle+spin
        n_obj = rng.randint(2, 6)
        objs = []
        for _ in range(n_obj):
            c = int(rng.randint(args.classes))
            color = class_color(c, args.classes)
            jitter = rng.randint(-25, 26, 3)
            col = tuple(int(v) for v in np.clip(color + jitter, 0, 255))
            objs.append({
                "c": c, "col": col,
                "cx": float(rng.randint(s // 6, 5 * s // 6)),
                "cy": float(rng.randint(s // 6, 5 * s // 6)),
                "vx": float(rng.randn() * s / 60),
                "vy": float(rng.randn() * s / 60),
                "ax": float(rng.randint(s // 16, s // 6)),
                "ay": float(rng.randint(s // 16, s // 6)),
                "ang": float(rng.rand() * np.pi),
                "spin": float(rng.randn() * 0.1),
                "segs": [], "areas": [], "boxes": [],
            })

        fnames = []
        for fi in range(args.frames):
            img = bg.copy()
            for o in objs:
                cx = o["cx"] + o["vx"] * fi
                cy = o["cy"] + o["vy"] * fi
                ang = o["ang"] + o["spin"] * fi
                if o["c"] % 2 == 0:
                    pts = ellipse_polygon(cx, cy, o["ax"], o["ay"], ang)
                else:
                    box = cv2.boxPoints(((cx, cy),
                                         (o["ax"] * 2, o["ay"] * 2),
                                         float(np.degrees(ang))))
                    pts = np.asarray(box, np.float64)
                pts[:, 0] = np.clip(pts[:, 0], 0, s - 1)
                pts[:, 1] = np.clip(pts[:, 1], 0, s - 1)
                x0, y0 = pts.min(0)
                x1, y1 = pts.max(0)
                if (x1 - x0) < 4 or (y1 - y0) < 4:
                    # fully off-canvas this frame: null segmentation
                    # (YTVIS uses null for absent frames)
                    o["segs"].append(None)
                    o["areas"].append(None)
                    o["boxes"].append(None)
                    continue
                cv2.fillPoly(img, [pts.astype(np.int32)], o["col"])
                mask = np.zeros((s, s), np.uint8)
                cv2.fillPoly(mask, [pts.astype(np.int32)], 1)
                o["segs"].append([pts.reshape(-1).tolist()])
                o["areas"].append(float(mask.sum()))
                o["boxes"].append([float(x0), float(y0),
                                   float(x1 - x0), float(y1 - y0)])
            rel = f"{vdir}/{fi:05d}.jpg"
            cv2.imwrite(os.path.join(img_root, rel), img)
            fnames.append(rel)

        vid = vi + 1
        videos.append({"id": vid, "width": s, "height": s,
                       "length": args.frames, "file_names": fnames})
        for o in objs:
            if not any(a is not None for a in o["areas"]):
                continue
            annotations.append({
                "id": aid, "video_id": vid, "category_id": o["c"] + 1,
                "iscrowd": 0, "segmentations": o["segs"],
                "areas": o["areas"], "bboxes": o["boxes"],
            })
            aid += 1

    data = {
        "videos": videos,
        "annotations": annotations,
        "categories": [{"id": c + 1, "name": f"shape_{c}"}
                       for c in range(args.classes)],
    }
    out = os.path.join(base, f"{args.split}.json")
    with open(out, "w") as f:
        json.dump(data, f)
    print(f"wrote {len(videos)} videos / {len(annotations)} tracks -> {out}")


if __name__ == "__main__":
    main()
