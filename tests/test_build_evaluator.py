"""Evaluator factory routing (evaluation/build.py vs reference
Trainer.build_evaluator dispatch, train_net.py:142-222)."""

import pytest

from mp_former_tpu.config import (add_deeplab_config, add_maskformer2_config,
                                  get_cfg)
from mp_former_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from mp_former_tpu.data.datasets import builtin  # noqa: F401
from mp_former_tpu.evaluation.build import build_evaluator
from mp_former_tpu.evaluation.cityscapes_eval import (
    CityscapesInstanceEvaluator, CityscapesSemSegEvaluator)
from mp_former_tpu.evaluation.evaluators import (COCOEvaluator,
                                                 COCOPanopticEvaluator,
                                                 SemSegEvaluator)


def _cfg(**test_flags):
    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    for k, v in test_flags.items():
        setattr(cfg.MODEL.MASK_FORMER.TEST, k, v)
    return cfg


def _types(evset):
    return [type(e.evaluator).__name__ for e in evset.entries]


def test_coco_instance():
    evset = build_evaluator(_cfg(INSTANCE_ON=True), "coco_2017_val",
                            records=[])
    assert _types(evset) == ["COCOEvaluator"]
    assert evset.tasks == ["instance"]


def test_coco_panoptic_all_tasks():
    cfg = _cfg(INSTANCE_ON=True, SEMANTIC_ON=True, PANOPTIC_ON=True)
    evset = build_evaluator(cfg, "coco_2017_val_panoptic_with_sem_seg",
                            records=[])
    assert _types(evset) == [
        "COCOPanopticEvaluator", "COCOEvaluator", "SemSegEvaluator"]
    assert evset.tasks == ["instance", "panoptic", "semantic"]


def test_cityscapes_types():
    assert _types(build_evaluator(
        _cfg(), "cityscapes_fine_instance_seg_val", records=[])) == \
        ["CityscapesInstanceEvaluator"]
    assert _types(build_evaluator(
        _cfg(), "cityscapes_fine_sem_seg_val", records=[])) == \
        ["CityscapesSemSegEvaluator"]
    cfg = _cfg(SEMANTIC_ON=True, INSTANCE_ON=True, PANOPTIC_ON=True)
    assert _types(build_evaluator(
        cfg, "cityscapes_fine_panoptic_val", records=[])) == \
        ["COCOPanopticEvaluator", "CityscapesSemSegEvaluator",
         "CityscapesInstanceEvaluator"]


def test_coco_and_sem_seg_ungated():
    """Reference dispatches 'coco' and 'sem_seg' unconditionally
    (train_net.py:156-166) — TEST switches only gate the panoptic extras."""
    cfg = _cfg(INSTANCE_ON=False, SEMANTIC_ON=False, PANOPTIC_ON=False)
    assert _types(build_evaluator(cfg, "coco_2017_val", records=[])) == \
        ["COCOEvaluator"]
    assert _types(build_evaluator(cfg, "ade20k_sem_seg_val", records=[])) == \
        ["SemSegEvaluator"]


def test_ade20k_panoptic_types():
    cfg = _cfg(SEMANTIC_ON=True, INSTANCE_ON=True, PANOPTIC_ON=True)
    # InstanceSegEvaluator is a COCOEvaluator alias (reference's only
    # relaxes contiguous-id assertions, instance_evaluation.py:29-107)
    assert _types(build_evaluator(cfg, "ade20k_panoptic_val", records=[])) == \
        ["SemSegEvaluator", "COCOPanopticEvaluator", "COCOEvaluator"]


def test_mapillary_types():
    cfg = _cfg(SEMANTIC_ON=True, INSTANCE_ON=True, PANOPTIC_ON=True)
    assert _types(build_evaluator(
        cfg, "mapillary_vistas_panoptic_val", records=[])) == \
        ["COCOPanopticEvaluator", "COCOEvaluator", "SemSegEvaluator"]


def test_lvis_type(tmp_path):
    import json

    jf = tmp_path / "lvis.json"
    jf.write_text(json.dumps({"categories": [], "images": []}))
    MetadataCatalog.get("lvis_v1_val").set(json_file=str(jf))
    assert _types(build_evaluator(_cfg(), "lvis_v1_val", records=[])) == \
        ["LVISEvaluator"]


def test_no_evaluator_raises():
    # a panoptic-only dataset with every TEST switch off has no evaluator
    cfg = _cfg(INSTANCE_ON=False, SEMANTIC_ON=False, PANOPTIC_ON=False)
    with pytest.raises(NotImplementedError):
        build_evaluator(cfg, "mapillary_vistas_panoptic_val", records=[])
