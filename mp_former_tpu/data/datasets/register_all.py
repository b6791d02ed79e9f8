"""Dataset registrations beyond COCO instances (reference
mask2former/data/datasets/register_*.py family). Standard d2 directory
layout rooted at $DETECTRON2_DATASETS."""

from __future__ import annotations

import json
import os
from typing import List, Optional

from ..catalog import DatasetCatalog, MetadataCatalog
from .builtin_meta import (ADE20K_150_CLASSES, ADE20K_THING_IDS,
                           CITYSCAPES_SEM_SEG_CLASSES,
                           CITYSCAPES_THING_CLASSES, coco_panoptic_classes)


def _file_pair_records(image_dir: str, gt_dir: str, image_ext: str,
                       gt_ext: str, gt_key: str) -> List[dict]:
    records = []
    if not os.path.isdir(image_dir):
        return records
    for i, f in enumerate(sorted(os.listdir(image_dir))):
        if not f.endswith(image_ext):
            continue
        base = f[: -len(image_ext)]
        gt = os.path.join(gt_dir, base + gt_ext)
        records.append({
            "file_name": os.path.join(image_dir, f),
            gt_key: gt,
            "image_id": i,
            "height": None,
            "width": None,
        })
    return records


def register_sem_seg(name: str, image_dir: str, gt_dir: str,
                     classes: List[str], ignore_label: int = 255,
                     image_ext: str = ".jpg", gt_ext: str = ".png"):
    DatasetCatalog.register(
        name, lambda: _file_pair_records(image_dir, gt_dir, image_ext, gt_ext,
                                         "sem_seg_file_name"))
    MetadataCatalog.get(name).set(
        stuff_classes=classes, ignore_label=ignore_label,
        evaluator_type="sem_seg", image_root=image_dir, sem_seg_root=gt_dir)


def load_coco_panoptic_json(json_file, image_root, pan_root, dataset_name=None):
    with open(json_file) as f:
        data = json.load(f)
    cats = sorted(data["categories"], key=lambda c: c["id"])
    id_map = {c["id"]: i for i, c in enumerate(cats)}
    thing_map = {id_map[c["id"]]: bool(c.get("isthing", 0)) for c in cats}
    if dataset_name:
        MetadataCatalog.get(dataset_name).set(
            panoptic_classes=[c["name"] for c in cats],
            dataset_id_to_contiguous_id=id_map,
            thing_map=thing_map)
    records = []
    img_by_id = {i["id"]: i for i in data["images"]}
    for ann in data["annotations"]:
        img = img_by_id[ann["image_id"]]
        segments = [
            dict(s, category_id=id_map[s["category_id"]])
            for s in ann["segments_info"]
        ]
        records.append({
            "file_name": os.path.join(
                image_root, img["file_name"].replace(".png", ".jpg")),
            "pan_seg_file_name": os.path.join(pan_root, ann["file_name"]),
            "segments_info": segments,
            "image_id": ann["image_id"],
            "height": img["height"],
            "width": img["width"],
        })
    return records


def register_coco_panoptic(name, json_file, image_root, pan_root):
    DatasetCatalog.register(
        name, lambda: load_coco_panoptic_json(json_file, image_root, pan_root, name))
    MetadataCatalog.get(name).set(evaluator_type="coco_panoptic_seg",
                                  panoptic_json=json_file,
                                  panoptic_root=pan_root)


def register_all(root: Optional[str] = None):
    root = root or os.environ.get("DETECTRON2_DATASETS", "datasets")

    # COCO panoptic (reference register via d2 builtin + register_coco_panoptic_annos_semseg)
    for split in ("train2017", "val2017"):
        name = f"coco_2017_{split.replace('2017', '')}_panoptic"
        if name not in DatasetCatalog:
            register_coco_panoptic(
                name,
                os.path.join(root, f"coco/annotations/panoptic_{split}.json"),
                os.path.join(root, f"coco/{split}"),
                os.path.join(root, f"coco/panoptic_{split}"))

    # ADE20K semantic (SceneParsing-150)
    for split, dirn in (("train", "training"), ("val", "validation")):
        name = f"ade20k_sem_seg_{split}"
        if name not in DatasetCatalog:
            register_sem_seg(
                name,
                os.path.join(root, f"ADEChallengeData2016/images/{dirn}"),
                os.path.join(root, f"ADEChallengeData2016/annotations_detectron2/{dirn}"),
                ADE20K_150_CLASSES)

    # Cityscapes semantic
    for split in ("train", "val"):
        name = f"cityscapes_fine_sem_seg_{split}"
        if name not in DatasetCatalog:
            register_sem_seg(
                name,
                os.path.join(root, f"cityscapes/leftImg8bit/{split}"),
                os.path.join(root, f"cityscapes/gtFine/{split}"),
                CITYSCAPES_SEM_SEG_CLASSES,
                image_ext="_leftImg8bit.png",
                gt_ext="_gtFine_labelTrainIds.png")

    # ADE20K panoptic / instance + Mapillary follow the same json-based
    # pattern once their prepare_* conversions have produced the jsons
    for name, (jf, ir, pr) in {
        "ade20k_panoptic_train": (
            "ADEChallengeData2016/ade20k_panoptic_train.json",
            "ADEChallengeData2016/images/training",
            "ADEChallengeData2016/ade20k_panoptic_train"),
        "ade20k_panoptic_val": (
            "ADEChallengeData2016/ade20k_panoptic_val.json",
            "ADEChallengeData2016/images/validation",
            "ADEChallengeData2016/ade20k_panoptic_val"),
        "mapillary_vistas_panoptic_train": (
            "mapillary_vistas/training/panoptic/panoptic_2018.json",
            "mapillary_vistas/training/images",
            "mapillary_vistas/training/panoptic"),
        "mapillary_vistas_panoptic_val": (
            "mapillary_vistas/validation/panoptic/panoptic_2018.json",
            "mapillary_vistas/validation/images",
            "mapillary_vistas/validation/panoptic"),
    }.items():
        if name not in DatasetCatalog:
            register_coco_panoptic(
                name, os.path.join(root, jf), os.path.join(root, ir),
                os.path.join(root, pr))


def register_more(root: Optional[str] = None):
    """ADE20K-full (847), COCO-stuff-10k, Mapillary Vistas semantic
    (reference register_ade20k_full.py / register_coco_stuff_10k.py /
    register_mapillary_vistas.py). Class-name tables for these long-tail
    datasets are loaded from the dataset's own metadata files when present;
    counts are fixed."""
    root = root or os.environ.get("DETECTRON2_DATASETS", "datasets")
    specs = {
        "ade20k_full_sem_seg_train": (
            "ADE20K_2021_17_01/images_detectron2/training",
            "ADE20K_2021_17_01/annotations_detectron2/training", 847),
        "ade20k_full_sem_seg_val": (
            "ADE20K_2021_17_01/images_detectron2/validation",
            "ADE20K_2021_17_01/annotations_detectron2/validation", 847),
        "coco_2017_train_stuff_10k_sem_seg": (
            "coco_stuff_10k/images_detectron2/train",
            "coco_stuff_10k/annotations_detectron2/train", 171),
        "coco_2017_test_stuff_10k_sem_seg": (
            "coco_stuff_10k/images_detectron2/test",
            "coco_stuff_10k/annotations_detectron2/test", 171),
        "mapillary_vistas_sem_seg_train": (
            "mapillary_vistas/training/images",
            "mapillary_vistas/training/labels", 65),
        "mapillary_vistas_sem_seg_val": (
            "mapillary_vistas/validation/images",
            "mapillary_vistas/validation/labels", 65),
    }
    for name, (img, gt, ncls) in specs.items():
        if name in DatasetCatalog:
            continue
        register_sem_seg(
            name, os.path.join(root, img), os.path.join(root, gt),
            [f"class_{i}" for i in range(ncls)],
            ignore_label=65 if "mapillary" in name else 255)
