#!/usr/bin/env python3
"""Convert ADE20K SceneParsing annotations for training (reference
datasets/prepare_ade20k_sem_seg.py): label ids are shifted by -1 so classes
become 0..149 and 'unlabeled' (0) becomes 255."""

import os
import sys
from pathlib import Path

import numpy as np
from PIL import Image


def convert(input_png: Path, output_png: Path):
    img = np.asarray(Image.open(input_png))
    assert img.dtype == np.uint8
    out = img.astype(np.int32) - 1
    out[out == -1] = 255
    Image.fromarray(out.astype(np.uint8)).save(output_png)


def main():
    dataset_dir = (
        Path(os.getenv("DETECTRON2_DATASETS", "datasets")) / "ADEChallengeData2016")
    for name in ("training", "validation"):
        ann_dir = dataset_dir / "annotations" / name
        out_dir = dataset_dir / "annotations_detectron2" / name
        out_dir.mkdir(parents=True, exist_ok=True)
        n = 0
        for f in sorted(ann_dir.glob("*.png")):
            convert(f, out_dir / f.name)
            n += 1
        print(f"{name}: converted {n} annotation maps -> {out_dir}")


if __name__ == "__main__":
    main()
