#!/usr/bin/env python3
"""Build ADE20K instance-segmentation COCO-style json (reference
datasets/prepare_ade20k_ins_seg.py role): emits instances for the 100 ADE20K
thing classes from the panoptic conversion output."""

import json
import os
import sys
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mp_former_tpu.data.datasets.builtin_meta import (ADE20K_150_CLASSES,
                                                      ADE20K_THING_IDS)


def rgb2id(c):
    c = c.astype(np.uint32)
    return c[..., 0] + 256 * c[..., 1] + 256 * 256 * c[..., 2]


def mask_to_rle_counts(mask: np.ndarray):
    flat = np.asfortranarray(mask).reshape(-1, order="F").astype(np.uint8)
    diff = np.nonzero(np.diff(flat))[0] + 1
    edges = np.concatenate([[0], diff, [flat.size]])
    counts = np.diff(edges).tolist()
    if flat[0] == 1:
        counts = [0] + counts
    return counts


def convert(dataset_dir: Path, pan_name: str, out_json: str):
    with open(dataset_dir / f"{pan_name}.json") as f:
        pan = json.load(f)
    thing_set = set(ADE20K_THING_IDS)
    cat_remap = {c: i for i, c in enumerate(sorted(thing_set))}
    images, annotations = [], []
    aid = 1
    for img, ann in zip(pan["images"], pan["annotations"]):
        images.append(img)
        pan_png = np.asarray(Image.open(dataset_dir / pan_name / ann["file_name"]))
        idmap = rgb2id(pan_png)
        for seg in ann["segments_info"]:
            if seg["category_id"] not in thing_set:
                continue
            m = idmap == seg["id"]
            if not m.any():
                continue
            ys, xs = np.nonzero(m)
            annotations.append({
                "id": aid, "image_id": img["id"],
                "category_id": cat_remap[seg["category_id"]] + 1,
                "segmentation": {"size": list(m.shape),
                                 "counts": mask_to_rle_counts(m)},
                "bbox": [int(xs.min()), int(ys.min()),
                         int(xs.max() - xs.min() + 1), int(ys.max() - ys.min() + 1)],
                "area": int(m.sum()), "iscrowd": 0,
            })
            aid += 1
    cats = [{"id": cat_remap[c] + 1, "name": ADE20K_150_CLASSES[c]}
            for c in sorted(thing_set)]
    with open(dataset_dir / out_json, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": cats}, f)
    print(f"{out_json}: {len(annotations)} instances")


def main():
    root = Path(os.getenv("DETECTRON2_DATASETS", "datasets")) / "ADEChallengeData2016"
    convert(root, "ade20k_panoptic_train", "ade20k_instance_train.json")
    convert(root, "ade20k_panoptic_val", "ade20k_instance_val.json")


if __name__ == "__main__":
    main()
