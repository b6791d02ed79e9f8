#!/usr/bin/env python3
"""Generate COCO semantic-segmentation pngs from panoptic annotations
(reference datasets/prepare_coco_semantic_annos_from_panoptic_annos.py).
Thing classes first (0-79), stuff classes next (80-132), 255 = unlabeled."""

import json
import multiprocessing as mp
import os
import sys
from functools import partial
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mp_former_tpu.data.dataset_mappers.mask_former_mappers import rgb2id


def _one(task, id_map):
    input_png, output_png, segments = task
    pan = rgb2id(np.asarray(Image.open(input_png), dtype=np.uint32))
    out = np.full(pan.shape, 255, np.uint8)
    for seg in segments:
        out[pan == seg["id"]] = id_map[seg["category_id"]]
    Image.fromarray(out).save(output_png)


def separate(panoptic_json, panoptic_root, sem_seg_root):
    os.makedirs(sem_seg_root, exist_ok=True)
    with open(panoptic_json) as f:
        data = json.load(f)
    cats = sorted(data["categories"], key=lambda c: (not c["isthing"], c["id"]))
    id_map = {c["id"]: i for i, c in enumerate(cats)}
    tasks = [
        (os.path.join(panoptic_root, ann["file_name"]),
         os.path.join(sem_seg_root, ann["file_name"]),
         ann["segments_info"])
        for ann in data["annotations"]
    ]
    with mp.Pool(max(mp.cpu_count() // 2, 4)) as pool:
        pool.map(partial(_one, id_map=id_map), tasks, chunksize=100)
    print(f"wrote {len(tasks)} semantic maps -> {sem_seg_root}")


def main():
    root = Path(os.getenv("DETECTRON2_DATASETS", "datasets")) / "coco"
    for s in ("train2017", "val2017"):
        separate(
            root / "annotations" / f"panoptic_{s}.json",
            root / f"panoptic_{s}",
            root / f"panoptic_semseg_{s}")


if __name__ == "__main__":
    main()
