"""Real class/metadata tables and evaluator_type routing
(reference register_*.py family; VERDICT round-1 missing item #5/#7)."""

import numpy as np
import pytest

from mp_former_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from mp_former_tpu.data.datasets import builtin  # noqa: F401 — registers
from mp_former_tpu.data.datasets import metadata as M


def test_no_placeholder_class_names():
    for name in MetadataCatalog.list():
        meta = MetadataCatalog.get(name)
        for key in ("stuff_classes", "thing_classes", "panoptic_classes"):
            classes = meta.get(key)
            if classes:
                assert not any(c.startswith("class_") for c in classes), \
                    f"{name}.{key} has placeholder names"


def test_ade20k_full_847():
    names = M.ade20k_full_classes()
    assert len(names) == 847
    # spot-check against reference register_ade20k_full.py trainId order
    assert names[0] == "wall"
    assert names[2] == "sky"
    assert names[11] == "person, individual, someone, somebody, mortal, soul"


def test_ade20k_150_meta():
    meta = M.ade20k_150_meta()
    assert len(meta["stuff_classes"]) == 150
    assert len(meta["thing_classes"]) == 100
    assert meta["stuff_classes"][0] == "wall"
    assert meta["thing_map"][0] is False  # wall is stuff
    # person (id 12) is a thing in ade20k-panoptic
    idx = meta["stuff_classes"].index("person")
    assert meta["thing_map"][idx] is True
    assert len(meta["stuff_colors"]) == 150


def test_mapillary_65():
    sem = M.mapillary_sem_seg_meta()
    assert len(sem["stuff_classes"]) == 65
    assert sem["stuff_classes"][0] == "Bird"
    pan = M.mapillary_panoptic_meta()
    assert len(pan["stuff_classes"]) == 65
    assert pan["thing_map"][0] is True  # Bird has instances


def test_coco_stuff_171():
    names = M.coco_stuff_171_classes()
    assert len(names) == 171
    assert names[0] == "person"


def test_evaluator_types_match_reference_dispatch():
    """Every DATASETS.TEST value in the config tree resolves to the
    reference's evaluator_type (reference train_net.py:142-222)."""
    expected = {
        "coco_2017_val": "coco",
        "coco_2017_val_panoptic_with_sem_seg": "coco_panoptic_seg",
        "ade20k_sem_seg_val": "sem_seg",
        "ade20k_instance_val": "coco",
        "ade20k_panoptic_val": "ade20k_panoptic_seg",
        "cityscapes_fine_sem_seg_val": "cityscapes_sem_seg",
        "cityscapes_fine_instance_seg_val": "cityscapes_instance",
        "cityscapes_fine_panoptic_val": "cityscapes_panoptic_seg",
        "mapillary_vistas_sem_seg_val": "sem_seg",
        "mapillary_vistas_panoptic_val": "mapillary_vistas_panoptic_seg",
        "lvis_v1_val": "lvis",
    }
    for name, et in expected.items():
        assert name in DatasetCatalog, name
        assert MetadataCatalog.get(name).evaluator_type == et, name


def test_cityscapes_instance_loader(tmp_path):
    """Polygon json -> contiguous thing ids, group -> iscrowd."""
    import json

    img_dir = tmp_path / "leftImg8bit" / "val" / "city"
    gt_dir = tmp_path / "gtFine" / "val" / "city"
    img_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    import cv2

    cv2.imwrite(str(img_dir / "city_0_0_leftImg8bit.png"),
                np.zeros((32, 64, 3), np.uint8))
    (gt_dir / "city_0_0_gtFine_polygons.json").write_text(json.dumps({
        "imgHeight": 32, "imgWidth": 64,
        "objects": [
            {"label": "car", "polygon": [[0, 0], [10, 0], [10, 10]]},
            {"label": "cargroup", "polygon": [[20, 0], [30, 0], [30, 10]]},
            {"label": "sky", "polygon": [[0, 0], [64, 0], [64, 5]]},
        ]}))
    from mp_former_tpu.data.datasets.register_all import \
        load_cityscapes_instances

    recs = load_cityscapes_instances(
        str(tmp_path / "leftImg8bit" / "val"), str(tmp_path / "gtFine" / "val"))
    assert len(recs) == 1
    annos = recs[0]["annotations"]
    assert len(annos) == 2  # sky is not a thing
    assert annos[0]["category_id"] == 2  # car
    assert annos[0]["iscrowd"] == 0
    assert annos[1]["iscrowd"] == 1  # cargroup


def test_cityscapes_panoptic_path_derivation(tmp_path):
    """createPanopticImgs writes images[].file_name as
    '<city>_<seq>_<frame>_leftImg8bit.png' — derived leftImg8bit/gtFine
    sibling paths must not double the suffix."""
    import json

    from mp_former_tpu.data.datasets.register_all import (
        register_cityscapes_panoptic)

    gt = tmp_path / "gtFine"
    (gt).mkdir()
    data = {
        "images": [{"id": "frankfurt_000000_000294", "width": 2048,
                    "height": 1024,
                    "file_name": "frankfurt_000000_000294_leftImg8bit.png"}],
        "annotations": [{
            "image_id": "frankfurt_000000_000294",
            "file_name": "frankfurt_000000_000294_gtFine_panoptic.png",
            "segments_info": []}],
        "categories": [{"id": 7, "name": "road", "isthing": 0}],
    }
    (gt / "cityscapes_panoptic_val.json").write_text(json.dumps(data))
    name = "test_cs_pan_derivation"
    if name not in DatasetCatalog:
        register_cityscapes_panoptic(
            name, str(tmp_path / "leftImg8bit"), str(gt), "val")
    recs = DatasetCatalog.get(name)
    assert len(recs) == 1
    r = recs[0]
    stem = "frankfurt_000000_000294"
    assert r["file_name"].endswith(
        f"leftImg8bit/val/frankfurt/{stem}_leftImg8bit.png"), r["file_name"]
    assert "leftImg8bit_leftImg8bit" not in r["file_name"]
    assert r["sem_seg_file_name"].endswith(
        f"gtFine/val/frankfurt/{stem}_gtFine_labelTrainIds.png")
    assert r["instance_id_file"].endswith(f"{stem}_gtFine_instanceIds.png")


def test_lvis_images_without_file_name(tmp_path):
    """LVIS v1 image entries carry only coco_url; the loader must derive
    'val2017/<id>.jpg' like d2's LVIS loader."""
    import json

    from mp_former_tpu.data.datasets.coco import load_coco_json

    data = {
        "images": [{
            "id": 1, "width": 640, "height": 480,
            "coco_url": "http://images.cocodataset.org/val2017/000000397133.jpg",
        }],
        "annotations": [{
            "id": 1, "image_id": 1, "category_id": 3, "bbox": [0, 0, 10, 10],
            "segmentation": [[0, 0, 10, 0, 10, 10]], "area": 50.0}],
        "categories": [{"id": 3, "name": "applesauce"}],
    }
    jf = tmp_path / "lvis_v1_val.json"
    jf.write_text(json.dumps(data))
    recs = load_coco_json(str(jf), "/data/coco", filter_empty=False)
    assert recs[0]["file_name"] == "/data/coco/val2017/000000397133.jpg"
    assert recs[0]["annotations"][0]["category_id"] == 0
