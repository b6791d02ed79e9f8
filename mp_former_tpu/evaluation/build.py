"""Evaluator factory keyed on dataset `evaluator_type` metadata, mirroring
the reference's Trainer.build_evaluator dispatch (train_net.py:142-222):

| evaluator_type                 | evaluators (gated by MASK_FORMER.TEST.*) |
|--------------------------------|------------------------------------------|
| sem_seg                        | SemSeg                                    |
| coco                           | COCO instance                             |
| coco_panoptic_seg              | Panoptic(PQ) + COCO instance + SemSeg     |
| ade20k_panoptic_seg            | SemSeg + Panoptic + InstanceSeg           |
| mapillary_vistas_panoptic_seg  | Panoptic + InstanceSeg + SemSeg           |
| cityscapes_instance            | CityscapesInstance (official protocol)    |
| cityscapes_sem_seg             | CityscapesSemSeg (IoU/iIoU)               |
| cityscapes_panoptic_seg        | CityscapesSemSeg + Panoptic + CsInstance  |
| lvis                           | LVIS (federated AP)                       |

One model forward serves every evaluator: EvaluatorSet.tasks says which
post-processings ('instance'/'semantic'/'panoptic') the loop must produce.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


def _load_sem_seg_gt(record: dict):
    import cv2

    path = record.get("sem_seg_file_name")
    if not path:
        return None
    g = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if g is None:
        return None
    return g[..., 0] if g.ndim == 3 else g


class _Entry:
    """One evaluator + the post-processed output family it consumes."""

    def __init__(self, task: str, evaluator, key: str):
        self.task = task
        self.evaluator = evaluator
        self.key = key  # result-dict key

    def process(self, record: dict, data):
        t, ev = self.task, self.evaluator
        if t == "instance":
            scores, classes, masks = data
            from .cityscapes_eval import CityscapesInstanceEvaluator

            if isinstance(ev, CityscapesInstanceEvaluator):
                ev.process(record, scores, classes,
                           [masks[i] for i in range(masks.shape[0])])
            else:
                ev.process(record["image_id"], scores, classes,
                           [masks[i] for i in range(masks.shape[0])])
        elif t == "semantic":
            pred = data.argmax(0)
            from .cityscapes_eval import CityscapesSemSegEvaluator

            if isinstance(ev, CityscapesSemSegEvaluator):
                ev.process(pred, record)
            else:
                gt = _load_sem_seg_gt(record)
                if gt is None:
                    logger.warning("no sem_seg GT for image %s; skipped",
                                   record.get("image_id"))
                    return
                ev.process(np.asarray(pred), gt)
        elif t == "panoptic":
            pan_map, segments = data
            ev.process_prediction(record, pan_map, segments)

    def evaluate(self):
        return self.evaluator.evaluate()


class EvaluatorSet:
    def __init__(self, entries: List[_Entry]):
        self.entries = entries

    @property
    def tasks(self):
        return sorted({e.task for e in self.entries})

    def reset(self):
        for e in self.entries:
            e.evaluator.reset()

    def merge_from(self, other: "EvaluatorSet"):
        """Fold another set's accumulated state into this one (distributed
        eval: each rank/process accumulates a disjoint record shard; states
        are merged before evaluate(), mirroring the reference's d2
        comm.gather of predictions, train_net.py:84-86)."""
        assert len(self.entries) == len(other.entries), \
            "merge_from requires evaluator sets built from the same config"
        for mine, theirs in zip(self.entries, other.entries):
            mine.evaluator.merge_from(theirs.evaluator)

    def process(self, record: dict, task_outputs: Dict):
        for e in self.entries:
            if e.task in task_outputs:
                e.process(record, task_outputs[e.task])

    def evaluate(self) -> Dict:
        """Merged result dict; evaluators already return task-keyed dicts
        ({'segm': ...}, {'sem_seg': ...}, {'panoptic_seg': ...})."""
        results = {}
        for e in self.entries:
            r = e.evaluate()
            if not isinstance(r, dict):
                r = {e.key: r}
            for k, v in r.items():
                if k in results and isinstance(results[k], dict) \
                        and isinstance(v, dict):
                    results[k].update(v)
                else:
                    results[k] = v
        return results


def is_thing_array(cfg, meta) -> np.ndarray:
    thing_map = meta.get("thing_map", {}) or {}
    k = cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES
    return np.array([thing_map.get(i, True) for i in range(k)])


def build_evaluator(cfg, dataset_name: str,
                    records: Optional[List[dict]] = None) -> EvaluatorSet:
    """Reference Trainer.build_evaluator (train_net.py:142-222)."""
    from ..data.catalog import DatasetCatalog, MetadataCatalog
    from .cityscapes_eval import (CityscapesInstanceEvaluator,
                                  CityscapesSemSegEvaluator)
    from .evaluators import (COCOEvaluator, COCOPanopticEvaluator,
                             InstanceSegEvaluator, SemSegEvaluator)
    from .lvis_eval import LVISEvaluator

    meta = MetadataCatalog.get(dataset_name)
    et = meta.get("evaluator_type")
    if et is None:
        raise NotImplementedError(
            f"no evaluator_type registered for dataset {dataset_name}")
    if records is None:
        records = DatasetCatalog.get(dataset_name)
    test_cfg = cfg.MODEL.MASK_FORMER.TEST
    num_classes = cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES
    ignore = meta.get("ignore_label", cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE)

    entries: List[_Entry] = []

    def sem(require_gt: bool = False):
        # the reference appends SemSegEvaluator unconditionally; for panoptic
        # datasets registered without sem-seg GT (e.g. coco_*_panoptic
        # instead of *_with_sem_seg) that evaluates 0 images into NaN mIoU —
        # skip with a warning instead
        if require_gt and records and not records[0].get("sem_seg_file_name"):
            logger.warning(
                "%s has no sem_seg_file_name GT; skipping the semantic "
                "evaluator (use the *_with_sem_seg registration for mIoU)",
                dataset_name)
            return
        entries.append(_Entry(
            "semantic", SemSegEvaluator(num_classes, ignore), "sem_seg"))

    def coco_inst(cls=COCOEvaluator):
        entries.append(_Entry(
            "instance",
            cls(records, max_dets=cfg.TEST.DETECTIONS_PER_IMAGE), "segm"))

    def pan():
        thing_map = meta.get("thing_map", {}) or {}
        entries.append(_Entry(
            "panoptic", COCOPanopticEvaluator(thing_map), "panoptic_seg"))

    # semantic segmentation (reference :156-163 — NOT gated on SEMANTIC_ON)
    if et in ("sem_seg", "ade20k_panoptic_seg"):
        sem()
    # instance segmentation (:164-166 — NOT gated on INSTANCE_ON)
    if et == "coco":
        coco_inst()
    # panoptic segmentation (:167-177)
    if et in ("coco_panoptic_seg", "ade20k_panoptic_seg",
              "cityscapes_panoptic_seg", "mapillary_vistas_panoptic_seg") \
            and test_cfg.PANOPTIC_ON:
        pan()
    # COCO panoptic extras (:178-182)
    if et == "coco_panoptic_seg" and test_cfg.INSTANCE_ON:
        coco_inst()
    if et == "coco_panoptic_seg" and test_cfg.SEMANTIC_ON:
        sem(require_gt=True)
    # Mapillary Vistas extras (:183-188)
    if et == "mapillary_vistas_panoptic_seg" and test_cfg.INSTANCE_ON:
        coco_inst(InstanceSegEvaluator)
    if et == "mapillary_vistas_panoptic_seg" and test_cfg.SEMANTIC_ON:
        sem(require_gt=True)
    # Cityscapes (:189-209)
    if et == "cityscapes_instance":
        entries.append(_Entry(
            "instance", CityscapesInstanceEvaluator(), "segm"))
    if et == "cityscapes_sem_seg":
        entries.append(_Entry(
            "semantic", CityscapesSemSegEvaluator(), "sem_seg"))
    if et == "cityscapes_panoptic_seg":
        if test_cfg.SEMANTIC_ON:
            entries.append(_Entry(
                "semantic", CityscapesSemSegEvaluator(), "sem_seg"))
        if test_cfg.INSTANCE_ON:
            entries.append(_Entry(
                "instance", CityscapesInstanceEvaluator(), "segm"))
    # ADE20K instance (:210-212)
    if et == "ade20k_panoptic_seg" and test_cfg.INSTANCE_ON:
        coco_inst(InstanceSegEvaluator)
    # LVIS (:214-215)
    if et == "lvis":
        entries.append(_Entry(
            "instance",
            LVISEvaluator(records, meta.get("json_file"),
                          max_dets=max(cfg.TEST.DETECTIONS_PER_IMAGE, 300)),
            "segm"))

    if not entries:
        raise NotImplementedError(
            f"no Evaluator for the dataset {dataset_name} with the type {et}"
            " and the enabled MASK_FORMER.TEST switches")
    return EvaluatorSet(entries)
