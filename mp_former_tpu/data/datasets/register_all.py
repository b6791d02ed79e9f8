"""Dataset registrations beyond COCO instances (reference
mask2former/data/datasets/register_*.py family + the d2 builtins the
reference relies on: cityscapes, ade20k_instance, coco panoptic w/ semseg).
Standard d2 directory layout rooted at $DETECTRON2_DATASETS.

Every registration sets `evaluator_type` to the value the reference's
build_evaluator dispatches on (reference train_net.py:142-222) and carries
the real class/color/isthing tables (data/datasets/metadata.py)."""

from __future__ import annotations

import json
import os
from typing import List, Optional

from ..catalog import DatasetCatalog, MetadataCatalog
from . import metadata as M
from .builtin_meta import ADE20K_150_CLASSES
from .cityscapes_labels import (EVAL_LABELS, INSTANCE_LABELS, NAME_TO_LABEL)


def _file_pair_records(image_dir: str, gt_dir: str, image_ext: str,
                       gt_ext: str, gt_key: str) -> List[dict]:
    """Pair images with same-stem GT files; recurses into subdirectories
    (cityscapes nests per-city folders)."""
    records = []
    if not os.path.isdir(image_dir):
        return records
    i = 0
    for cur, _dirs, files in sorted(os.walk(image_dir)):
        rel = os.path.relpath(cur, image_dir)
        for f in sorted(files):
            if not f.endswith(image_ext):
                continue
            base = f[: -len(image_ext)]
            gt = os.path.join(gt_dir, rel, base + gt_ext) if rel != "." \
                else os.path.join(gt_dir, base + gt_ext)
            records.append({
                "file_name": os.path.join(cur, f),
                gt_key: gt,
                "image_id": i,
                "height": None,
                "width": None,
            })
            i += 1
    return records


def register_sem_seg(name: str, image_dir: str, gt_dir: str,
                     classes: List[str], ignore_label: int = 255,
                     image_ext: str = ".jpg", gt_ext: str = ".png",
                     evaluator_type: str = "sem_seg", **extra_meta):
    DatasetCatalog.register(
        name, lambda: _file_pair_records(image_dir, gt_dir, image_ext, gt_ext,
                                         "sem_seg_file_name"))
    MetadataCatalog.get(name).set(
        stuff_classes=classes, ignore_label=ignore_label,
        evaluator_type=evaluator_type, image_root=image_dir,
        sem_seg_root=gt_dir, **extra_meta)


def load_coco_panoptic_json(json_file, image_root, pan_root, dataset_name=None,
                            semseg_root=None, instances_json=None):
    """Panoptic records; with semseg_root also attaches sem_seg_file_name
    (reference register_coco_panoptic_annos_semseg.py:75-126)."""
    with open(json_file) as f:
        data = json.load(f)
    cats = sorted(data["categories"], key=lambda c: c["id"])
    id_map = {c["id"]: i for i, c in enumerate(cats)}
    thing_map = {id_map[c["id"]]: bool(c.get("isthing", 0)) for c in cats}
    if dataset_name:
        MetadataCatalog.get(dataset_name).set(
            panoptic_classes=[c["name"] for c in cats],
            stuff_classes=[c["name"] for c in cats],
            thing_classes=[c["name"] for c in cats if c.get("isthing", 0)],
            dataset_id_to_contiguous_id=id_map,
            thing_dataset_id_to_contiguous_id={
                c["id"]: id_map[c["id"]] for c in cats if c.get("isthing", 0)},
            thing_map=thing_map)
    records = []
    img_by_id = {i["id"]: i for i in data["images"]}
    anns_by_img = {}
    if instances_json and os.path.isfile(instances_json):
        from .coco import load_coco_json

        inst = load_coco_json(instances_json, image_root)
        anns_by_img = {r["image_id"]: r["annotations"] for r in inst}
    for ann in data["annotations"]:
        img = img_by_id[ann["image_id"]]
        segments = [
            dict(s, category_id=id_map[s["category_id"]])
            for s in ann["segments_info"]
        ]
        rec = {
            "file_name": os.path.join(
                image_root, img["file_name"].replace(".png", ".jpg")),
            "pan_seg_file_name": os.path.join(pan_root, ann["file_name"]),
            "segments_info": segments,
            "image_id": ann["image_id"],
            "height": img["height"],
            "width": img["width"],
        }
        if semseg_root:
            rec["sem_seg_file_name"] = os.path.join(
                semseg_root, ann["file_name"])
        if ann["image_id"] in anns_by_img:
            rec["annotations"] = anns_by_img[ann["image_id"]]
        records.append(rec)
    return records


def register_coco_panoptic(name, json_file, image_root, pan_root,
                           evaluator_type="coco_panoptic_seg",
                           semseg_root=None, instances_json=None,
                           **extra_meta):
    DatasetCatalog.register(
        name, lambda: load_coco_panoptic_json(
            json_file, image_root, pan_root, name, semseg_root,
            instances_json))
    extra_meta.setdefault("sem_seg_root", semseg_root)
    MetadataCatalog.get(name).set(evaluator_type=evaluator_type,
                                  panoptic_json=json_file,
                                  panoptic_root=pan_root,
                                  image_root=image_root,
                                  **extra_meta)


# ---------------------------------------------------------------------------
# Cityscapes (reference uses the d2 builtins: cityscapes_fine_{instance_seg,
# sem_seg,panoptic}_{train,val})
# ---------------------------------------------------------------------------

def load_cityscapes_instances(image_dir: str, gt_dir: str) -> List[dict]:
    """Instance records from the gtFine polygon annotations (d2
    load_cityscapes_instances role). category_id is the contiguous thing
    index (8 classes); *_gtFine_instanceIds.png is attached for the
    cityscapesscripts-protocol evaluator."""
    name_to_contig = {l.name: i for i, l in enumerate(INSTANCE_LABELS)}
    records = []
    if not os.path.isdir(image_dir):
        return records
    i = 0
    for cur, _dirs, files in sorted(os.walk(image_dir)):
        rel = os.path.relpath(cur, image_dir)
        for f in sorted(files):
            if not f.endswith("_leftImg8bit.png"):
                continue
            base = f[: -len("_leftImg8bit.png")]
            gtp = os.path.join(gt_dir, rel, base + "_gtFine_polygons.json")
            rec = {
                "file_name": os.path.join(cur, f),
                "image_id": i,
                "instance_id_file": os.path.join(
                    gt_dir, rel, base + "_gtFine_instanceIds.png"),
                "label_id_file": os.path.join(
                    gt_dir, rel, base + "_gtFine_labelIds.png"),
                "height": 1024,
                "width": 2048,
            }
            i += 1
            annos = []
            if os.path.isfile(gtp):
                with open(gtp) as fh:
                    poly = json.load(fh)
                rec["height"] = poly.get("imgHeight", 1024)
                rec["width"] = poly.get("imgWidth", 2048)
                for obj in poly.get("objects", []):
                    label = obj["label"]
                    # 'group' suffixed labels are crowd regions
                    iscrowd = 0
                    if label not in name_to_contig and label.endswith("group"):
                        label = label[: -len("group")]
                        iscrowd = 1
                    if label not in name_to_contig:
                        continue
                    flat = [float(v) for pt in obj["polygon"] for v in pt]
                    annos.append({
                        "category_id": name_to_contig[label],
                        "segmentation": [flat],
                        "iscrowd": iscrowd,
                        "bbox": _poly_bbox(obj["polygon"]),
                    })
            rec["annotations"] = annos
            records.append(rec)
    return records


def _poly_bbox(points):
    xs = [p[0] for p in points]
    ys = [p[1] for p in points]
    return [min(xs), min(ys), max(xs) - min(xs), max(ys) - min(ys)]


def register_cityscapes_instance(name, image_dir, gt_dir):
    DatasetCatalog.register(
        name, lambda: load_cityscapes_instances(image_dir, gt_dir))
    MetadataCatalog.get(name).set(
        evaluator_type="cityscapes_instance",
        thing_classes=[l.name for l in INSTANCE_LABELS],
        image_root=image_dir, gt_root=gt_dir)


def register_cityscapes_panoptic(name, image_dir, gt_dir, split):
    """cityscapes_fine_panoptic_* from gtFine/cityscapes_panoptic_{split}*
    (produced by cityscapesscripts createPanopticImgs)."""
    json_file = os.path.join(gt_dir, f"cityscapes_panoptic_{split}.json")
    pan_root = os.path.join(gt_dir, f"cityscapes_panoptic_{split}")

    def load():
        if not os.path.isfile(json_file):
            return []
        recs = load_coco_panoptic_json(json_file, image_dir, pan_root, name)
        # derive the city-nested gtFine/leftImg8bit siblings from the json's
        # image name; createPanopticImgs writes file_name as
        # '<city>_<seq>_<frame>_leftImg8bit.png', so strip BOTH possible
        # suffixes before re-appending (else paths double the suffix)
        for r in recs:
            stem = os.path.basename(r["file_name"])
            for suf in (".jpg", ".png"):
                if stem.endswith(suf):
                    stem = stem[: -len(suf)]
            for suf in ("_gtFine_panoptic", "_leftImg8bit"):
                if stem.endswith(suf):
                    stem = stem[: -len(suf)]
            city = stem.split("_")[0]
            r["file_name"] = os.path.join(
                image_dir, split, city, stem + "_leftImg8bit.png")
            r["sem_seg_file_name"] = os.path.join(
                gt_dir, split, city, stem + "_gtFine_labelTrainIds.png")
            r["instance_id_file"] = os.path.join(
                gt_dir, split, city, stem + "_gtFine_instanceIds.png")
            r["label_id_file"] = os.path.join(
                gt_dir, split, city, stem + "_gtFine_labelIds.png")
        return recs

    DatasetCatalog.register(name, load)
    MetadataCatalog.get(name).set(
        evaluator_type="cityscapes_panoptic_seg",
        panoptic_json=json_file, panoptic_root=pan_root,
        stuff_classes=[l.name for l in EVAL_LABELS],
        thing_classes=[l.name for l in EVAL_LABELS if l.hasInstances],
        thing_map={l.trainId: l.hasInstances for l in EVAL_LABELS},
        ignore_label=255, image_root=image_dir, gt_root=gt_dir)


# ---------------------------------------------------------------------------

def register_all(root: Optional[str] = None):
    root = root or os.environ.get("DETECTRON2_DATASETS", "datasets")

    # COCO panoptic (reference d2 builtin) + *_with_sem_seg (reference
    # register_coco_panoptic_annos_semseg.py:129-158)
    for split in ("train2017", "val2017"):
        short = split.replace("2017", "")
        name = f"coco_2017_{short}_panoptic"
        if name not in DatasetCatalog:
            register_coco_panoptic(
                name,
                os.path.join(root, f"coco/annotations/panoptic_{split}.json"),
                os.path.join(root, f"coco/{split}"),
                os.path.join(root, f"coco/panoptic_{split}"))
        name_ss = name + "_with_sem_seg"
        if name_ss not in DatasetCatalog:
            register_coco_panoptic(
                name_ss,
                os.path.join(root, f"coco/annotations/panoptic_{split}.json"),
                os.path.join(root, f"coco/{split}"),
                os.path.join(root, f"coco/panoptic_{split}"),
                semseg_root=os.path.join(root, f"coco/panoptic_semseg_{split}"),
                instances_json=os.path.join(
                    root, f"coco/annotations/instances_{split}.json"),
                ignore_label=255)

    # ADE20K semantic (SceneParsing-150)
    for split, dirn in (("train", "training"), ("val", "validation")):
        name = f"ade20k_sem_seg_{split}"
        if name not in DatasetCatalog:
            register_sem_seg(
                name,
                os.path.join(root, f"ADEChallengeData2016/images/{dirn}"),
                os.path.join(root, f"ADEChallengeData2016/annotations_detectron2/{dirn}"),
                ADE20K_150_CLASSES,
                stuff_colors=M.ade20k_150_meta()["stuff_colors"])

    # ADE20K instance (reference register_ade20k_instance.py:41-50)
    ade_inst_meta = M.ade20k_instance_meta()
    for split in ("train", "val"):
        name = f"ade20k_instance_{split}"
        if name not in DatasetCatalog:
            from .coco import register_coco_instances

            dirn = "training" if split == "train" else "validation"
            register_coco_instances(
                name,
                os.path.join(
                    root, f"ADEChallengeData2016/ade20k_instance_{split}.json"),
                os.path.join(root, f"ADEChallengeData2016/images/{dirn}"))
            MetadataCatalog.get(name).set(**ade_inst_meta)

    # Cityscapes semantic / instance / panoptic
    for split in ("train", "val"):
        img = os.path.join(root, f"cityscapes/leftImg8bit/{split}")
        gt = os.path.join(root, f"cityscapes/gtFine/{split}")
        name = f"cityscapes_fine_sem_seg_{split}"
        if name not in DatasetCatalog:
            register_sem_seg(
                name, img, gt,
                [l.name for l in EVAL_LABELS],
                image_ext="_leftImg8bit.png",
                gt_ext="_gtFine_labelTrainIds.png",
                evaluator_type="cityscapes_sem_seg",
                gt_root=os.path.join(root, "cityscapes/gtFine"))
        name = f"cityscapes_fine_instance_seg_{split}"
        if name not in DatasetCatalog:
            register_cityscapes_instance(name, img, gt)
        name = f"cityscapes_fine_panoptic_{split}"
        if name not in DatasetCatalog:
            register_cityscapes_panoptic(
                name, os.path.join(root, "cityscapes/leftImg8bit"),
                os.path.join(root, "cityscapes/gtFine"), split)

    # ADE20K panoptic + Mapillary Vistas panoptic (reference
    # register_ade20k_panoptic.py / register_mapillary_vistas_panoptic.py)
    ade_pan_meta = M.ade20k_150_meta()
    map_pan_meta = M.mapillary_panoptic_meta()
    for name, (jf, ir, pr, et, meta) in {
        "ade20k_panoptic_train": (
            "ADEChallengeData2016/ade20k_panoptic_train.json",
            "ADEChallengeData2016/images/training",
            "ADEChallengeData2016/ade20k_panoptic_train",
            "ade20k_panoptic_seg", ade_pan_meta),
        "ade20k_panoptic_val": (
            "ADEChallengeData2016/ade20k_panoptic_val.json",
            "ADEChallengeData2016/images/validation",
            "ADEChallengeData2016/ade20k_panoptic_val",
            "ade20k_panoptic_seg", ade_pan_meta),
        "mapillary_vistas_panoptic_train": (
            "mapillary_vistas/training/panoptic/panoptic_2018.json",
            "mapillary_vistas/training/images",
            "mapillary_vistas/training/panoptic",
            "mapillary_vistas_panoptic_seg", map_pan_meta),
        "mapillary_vistas_panoptic_val": (
            "mapillary_vistas/validation/panoptic/panoptic_2018.json",
            "mapillary_vistas/validation/images",
            "mapillary_vistas/validation/panoptic",
            "mapillary_vistas_panoptic_seg", map_pan_meta),
    }.items():
        if name not in DatasetCatalog:
            kw = dict(meta)
            if "ade20k" in name:
                kw["sem_seg_root"] = os.path.join(
                    root, "ADEChallengeData2016/annotations_detectron2",
                    "training" if name.endswith("train") else "validation")
                kw["ignore_label"] = 255
            else:
                kw["ignore_label"] = 65
            register_coco_panoptic(
                name, os.path.join(root, jf), os.path.join(root, ir),
                os.path.join(root, pr), evaluator_type=et, **kw)

    # LVIS v1 (reference build_evaluator supports evaluator_type 'lvis')
    for name, (jf, ir) in {
        "lvis_v1_train": ("lvis/lvis_v1_train.json", "coco/"),
        "lvis_v1_val": ("lvis/lvis_v1_val.json", "coco/"),
    }.items():
        if name not in DatasetCatalog:
            from .coco import register_coco_instances

            register_coco_instances(
                name, os.path.join(root, jf), os.path.join(root, ir))
            MetadataCatalog.get(name).set(evaluator_type="lvis")


def register_more(root: Optional[str] = None):
    """ADE20K-full (847), COCO-stuff-10k, Mapillary Vistas semantic
    (reference register_ade20k_full.py / register_coco_stuff_10k.py /
    register_mapillary_vistas.py) — real class tables from metadata/."""
    root = root or os.environ.get("DETECTRON2_DATASETS", "datasets")
    map_meta = M.mapillary_sem_seg_meta()
    specs = {
        "ade20k_full_sem_seg_train": (
            "ADE20K_2021_17_01/images_detectron2/training",
            "ADE20K_2021_17_01/annotations_detectron2/training",
            M.ade20k_full_classes(), 65535, {}),
        "ade20k_full_sem_seg_val": (
            "ADE20K_2021_17_01/images_detectron2/validation",
            "ADE20K_2021_17_01/annotations_detectron2/validation",
            M.ade20k_full_classes(), 65535, {}),
        "coco_2017_train_stuff_10k_sem_seg": (
            "coco_stuff_10k/images_detectron2/train",
            "coco_stuff_10k/annotations_detectron2/train",
            M.coco_stuff_171_classes(), 255, {}),
        "coco_2017_test_stuff_10k_sem_seg": (
            "coco_stuff_10k/images_detectron2/test",
            "coco_stuff_10k/annotations_detectron2/test",
            M.coco_stuff_171_classes(), 255, {}),
        "mapillary_vistas_sem_seg_train": (
            "mapillary_vistas/training/images",
            "mapillary_vistas/training/labels",
            map_meta["stuff_classes"], 65,
            {"stuff_colors": map_meta["stuff_colors"]}),
        "mapillary_vistas_sem_seg_val": (
            "mapillary_vistas/validation/images",
            "mapillary_vistas/validation/labels",
            map_meta["stuff_classes"], 65,
            {"stuff_colors": map_meta["stuff_colors"]}),
    }
    for name, (img, gt, classes, ignore, extra) in specs.items():
        if name in DatasetCatalog:
            continue
        register_sem_seg(
            name, os.path.join(root, img), os.path.join(root, gt),
            classes, ignore_label=ignore, **extra)
