#!/usr/bin/env python3
"""Build ADE20K panoptic annotations (reference datasets/prepare_ade20k_pan_seg.py):
combines the semantic pngs and the instance annotations into COCO-panoptic
format (id-encoded pngs + json) using the 100-thing/50-stuff ADE20K split."""

import json
import os
import sys
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mp_former_tpu.data.datasets.builtin_meta import (ADE20K_150_CLASSES,
                                                      ADE20K_THING_IDS)


def id2rgb(idmap):
    r = idmap % 256
    g = (idmap // 256) % 256
    b = idmap // (256 * 256)
    return np.stack([r, g, b], -1).astype(np.uint8)


def convert_split(dataset_dir: Path, split_dir: str, out_name: str):
    sem_dir = dataset_dir / "annotations_detectron2" / split_dir
    out_png_dir = dataset_dir / out_name
    out_png_dir.mkdir(exist_ok=True)
    thing_set = set(ADE20K_THING_IDS)

    images, annotations = [], []
    categories = [
        {"id": i, "name": n, "isthing": int(i in thing_set)}
        for i, n in enumerate(ADE20K_150_CLASSES)
    ]
    for img_id, f in enumerate(sorted(sem_dir.glob("*.png"))):
        sem = np.asarray(Image.open(f)).astype(np.int32)
        h, w = sem.shape
        pan = np.zeros((h, w), np.int32)
        segments = []
        next_id = 1
        # stuff: one segment per class; things without instance data: one
        # segment per class (instance splitting needs the instance jsons —
        # connected components as a practical stand-in)
        for c in np.unique(sem):
            if c == 255:
                continue
            mask = sem == c
            if int(c) in thing_set:
                import cv2

                ncomp, comp = cv2.connectedComponents(mask.astype(np.uint8))
                for k in range(1, ncomp):
                    m = comp == k
                    if m.sum() < 32:
                        continue
                    pan[m] = next_id
                    segments.append({"id": next_id, "category_id": int(c),
                                     "iscrowd": 0, "area": int(m.sum())})
                    next_id += 1
            else:
                pan[mask] = next_id
                segments.append({"id": next_id, "category_id": int(c),
                                 "iscrowd": 0, "area": int(mask.sum())})
                next_id += 1
        png_name = f.stem + ".png"
        Image.fromarray(id2rgb(pan)).save(out_png_dir / png_name)
        images.append({"id": img_id, "file_name": f.stem + ".jpg",
                       "height": h, "width": w})
        annotations.append({"image_id": img_id, "file_name": png_name,
                            "segments_info": segments})
    out_json = {"images": images, "annotations": annotations,
                "categories": categories}
    with open(dataset_dir / f"{out_name}.json", "w") as fh:
        json.dump(out_json, fh)
    print(f"{out_name}: {len(images)} images")


def main():
    root = Path(os.getenv("DETECTRON2_DATASETS", "datasets")) / "ADEChallengeData2016"
    convert_split(root, "training", "ade20k_panoptic_train")
    convert_split(root, "validation", "ade20k_panoptic_val")


if __name__ == "__main__":
    main()
