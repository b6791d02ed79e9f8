"""Semantic / panoptic / instance dataset mappers (reference
data/dataset_mappers/mask_former_{semantic,panoptic,instance}_dataset_mapper.py
and coco_panoptic_new_baseline_dataset_mapper.py).

Pipeline (semantic, reference :62-96): ResizeShortestEdge ->
RandomCrop_CategoryAreaConstraint -> ColorAugSSD -> RandomFlip; pad image
with 128 / sem_seg with ignore_label to a static canvas; per-class binary
masks become the mask-classification targets.
"""

from __future__ import annotations

from typing import Dict, Optional

import cv2
import numpy as np

from ...utils.registry import DATASET_MAPPER_REGISTRY
from ..transforms import (TransformRecord, apply_record_to_image,
                          block_any_pool, color_aug_ssd, lsj_transform,
                          resize_shortest_edge, resolve_gt_mask_stride)


def rgb2id(color: np.ndarray) -> np.ndarray:
    """COCO panoptic png encoding (R + 256*G + 256^2*B)."""
    color = color.astype(np.uint32)
    return color[..., 0] + 256 * color[..., 1] + 256 * 256 * color[..., 2]


def _apply_to_sem_seg(sem: np.ndarray, rec: TransformRecord, ignore: int) -> np.ndarray:
    out = sem[:, ::-1] if rec.flip else sem
    new_h = int(round(sem.shape[0] * rec.scale_y))
    new_w = int(round(sem.shape[1] * rec.scale_x))
    out = cv2.resize(out, (new_w, new_h), interpolation=cv2.INTER_NEAREST)
    y0, x0 = int(-rec.ty), int(-rec.tx)
    crop = out[y0: y0 + rec.out_h, x0: x0 + rec.out_w]
    canvas = np.full((rec.out_h, rec.out_w), ignore, dtype=sem.dtype)
    canvas[: crop.shape[0], : crop.shape[1]] = crop
    return canvas


def _random_crop_record(rng, rec: TransformRecord, crop_hw, sem=None,
                        single_category_max_area=1.0, ignore=255,
                        retries=10) -> TransformRecord:
    """d2 RandomCrop(_CategoryAreaConstraint): absolute crop after resize."""
    ch, cw = crop_hw
    h, w = rec.out_h, rec.out_w
    ch, cw = min(ch, h), min(cw, w)
    for _ in range(retries):
        y0 = rng.randint(0, h - ch + 1)
        x0 = rng.randint(0, w - cw + 1)
        if sem is None or single_category_max_area >= 1.0:
            break
        patch = sem[y0:y0 + ch, x0:x0 + cw]
        labels, cnt = np.unique(patch, return_counts=True)
        cnt = cnt[labels != ignore]
        if len(cnt) > 1 and cnt.max() < single_category_max_area * cnt.sum():
            break
    return TransformRecord(
        flip=rec.flip, src_w=rec.src_w, scale_x=rec.scale_x, scale_y=rec.scale_y,
        tx=rec.tx - x0, ty=rec.ty - y0, out_h=ch, out_w=cw)


class _BaseSemanticMapper:
    def __init__(self, cfg, is_train=True, max_instances: int = 100):
        self.is_train = is_train
        self.min_sizes = list(cfg.INPUT.MIN_SIZE_TRAIN)
        self.sampling = cfg.INPUT.MIN_SIZE_TRAIN_SAMPLING
        self.max_size = cfg.INPUT.MAX_SIZE_TRAIN
        self.crop_enabled = cfg.INPUT.CROP.ENABLED
        self.crop_type = cfg.INPUT.CROP.TYPE
        self.crop_size = list(cfg.INPUT.CROP.SIZE)
        self.single_cat_max = cfg.INPUT.CROP.SINGLE_CATEGORY_MAX_AREA
        self.color_aug = cfg.INPUT.COLOR_AUG_SSD
        self.ignore = cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE
        self.size_div = max(cfg.INPUT.SIZE_DIVISIBILITY, 32)
        self.fmt = cfg.INPUT.FORMAT
        self.max_instances = max_instances
        # GT mask stride (see coco_instance_new_baseline: lossless for the
        # grid-mode loss, which resizes GT to the 1/4 prediction grid)
        self.gt_mask_stride = resolve_gt_mask_stride(cfg)

    def _geometry(self, rng, h, w, sem=None):
        rec = resize_shortest_edge(rng, h, w, self.min_sizes, self.max_size,
                                   self.sampling, flip=True)
        if self.crop_enabled and self.is_train:
            if self.crop_type == "absolute":
                crop_hw = (int(self.crop_size[0]), int(self.crop_size[1]))
            else:  # relative / relative_range
                s0, s1 = self.crop_size[0], self.crop_size[-1]
                f = rng.uniform(s0, s1)
                crop_hw = (int(rec.out_h * f + 0.5), int(rec.out_w * f + 0.5))
            sem_resized = None
            if sem is not None and self.single_cat_max < 1.0:
                sem_resized = _apply_to_sem_seg(sem, rec, self.ignore)
            rec = _random_crop_record(rng, rec, crop_hw, sem_resized,
                                      self.single_cat_max, self.ignore)
        return rec

    def _canvas(self, rec):
        d = self.size_div
        h = (rec.out_h + d - 1) // d * d
        w = (rec.out_w + d - 1) // d * d
        if self.is_train and self.crop_enabled and self.crop_type == "absolute":
            # ONE static train canvas: multi-scale sampling makes the
            # post-crop size vary (min(crop, scaled) per sample), and
            # mixed-shape samples cannot share a batch np.stack / jit shape
            h = max(h, (int(self.crop_size[0]) + d - 1) // d * d)
            w = max(w, (int(self.crop_size[1]) + d - 1) // d * d)
        return h, w

    def _load_image(self, path, rng):
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            return None
        if self.fmt == "RGB":
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        return img


@DATASET_MAPPER_REGISTRY.register(name="mask_former_semantic")
class MaskFormerSemanticDatasetMapper(_BaseSemanticMapper):
    def __call__(self, record: Dict, rng: np.random.RandomState) -> Optional[Dict]:
        img = self._load_image(record["file_name"], rng)
        if img is None:
            return None
        sem = cv2.imread(record["sem_seg_file_name"], cv2.IMREAD_UNCHANGED)
        if sem is None:
            return None
        if sem.ndim == 3:
            sem = sem[..., 0]
        h, w = img.shape[:2]
        rec = self._geometry(rng, h, w, sem)
        if self.color_aug and self.is_train:
            img = color_aug_ssd(rng, img)
        image = apply_record_to_image(img, rec, pad_value=128.0)
        sem_t = _apply_to_sem_seg(sem, rec, self.ignore)
        ph, pw = self._canvas(rec)
        canvas = np.full((ph, pw, 3), 128, np.uint8)
        canvas[: image.shape[0], : image.shape[1]] = image
        sem_canvas = np.full((ph, pw), self.ignore, sem_t.dtype)
        sem_canvas[: sem_t.shape[0], : sem_t.shape[1]] = sem_t

        n_cap = self.max_instances
        st = self.gt_mask_stride
        # class presence from the FULL canvas + any-pooled masks: point
        # sampling ([::st]) can silently drop thin classes (poles, lines)
        ms_shape = ((sem_canvas.shape[0] + st - 1) // st,
                    (sem_canvas.shape[1] + st - 1) // st)
        labels = np.zeros((n_cap,), np.int32)
        masks = np.zeros((n_cap,) + ms_shape, bool)
        valid = np.zeros((n_cap,), bool)
        classes = np.unique(sem_canvas)
        classes = classes[classes != self.ignore]
        for i, c in enumerate(classes[:n_cap]):
            masks[i] = block_any_pool(sem_canvas == c, st)
            labels[i] = c
            valid[i] = True
        return {
            "image": canvas, "labels": labels, "masks": masks,
            "boxes": np.zeros((n_cap, 4), np.float32), "valid": valid,
            "sem_seg": sem_canvas.astype(np.int32),
            "image_id": record.get("image_id", -1),
            "height": record.get("height", h), "width": record.get("width", w),
        }


@DATASET_MAPPER_REGISTRY.register(name="mask_former_panoptic")
class MaskFormerPanopticDatasetMapper(_BaseSemanticMapper):
    """Panoptic targets from pan_seg png + segments_info
    (reference mask_former_panoptic_dataset_mapper.py:19)."""

    def __call__(self, record: Dict, rng: np.random.RandomState) -> Optional[Dict]:
        img = self._load_image(record["file_name"], rng)
        if img is None:
            return None
        pan = cv2.imread(record["pan_seg_file_name"], cv2.IMREAD_COLOR)
        if pan is None:
            return None
        pan = cv2.cvtColor(pan, cv2.COLOR_BGR2RGB)
        h, w = img.shape[:2]
        rec = self._geometry(rng, h, w)
        if self.color_aug and self.is_train:
            img = color_aug_ssd(rng, img)
        image = apply_record_to_image(img, rec, pad_value=128.0)
        pan_ids = rgb2id(pan)
        pan_t = _apply_to_sem_seg(pan_ids.astype(np.int64), rec, 0)
        ph, pw = self._canvas(rec)
        canvas = np.full((ph, pw, 3), 128, np.uint8)
        canvas[: image.shape[0], : image.shape[1]] = image
        pan_canvas = np.zeros((ph, pw), np.int64)
        pan_canvas[: pan_t.shape[0], : pan_t.shape[1]] = pan_t

        n_cap = self.max_instances
        st = self.gt_mask_stride
        ms_shape = ((pan_canvas.shape[0] + st - 1) // st,
                    (pan_canvas.shape[1] + st - 1) // st)
        labels = np.zeros((n_cap,), np.int32)
        masks = np.zeros((n_cap,) + ms_shape, bool)
        valid = np.zeros((n_cap,), bool)
        i = 0
        for seg in record.get("segments_info", []):
            if seg.get("iscrowd", 0) or i >= n_cap:
                continue
            m = block_any_pool(pan_canvas == seg["id"], st)
            if not m.any():
                continue
            masks[i] = m
            labels[i] = seg["category_id"]
            valid[i] = True
            i += 1
        return {
            "image": canvas, "labels": labels, "masks": masks,
            "boxes": np.zeros((n_cap, 4), np.float32), "valid": valid,
            "image_id": record.get("image_id", -1),
            "height": record.get("height", h), "width": record.get("width", w),
        }


@DATASET_MAPPER_REGISTRY.register(name="mask_former_instance")
class MaskFormerInstanceDatasetMapper(_BaseSemanticMapper):
    """ResizeShortestEdge + crop instance mapper with bitmask targets
    (reference mask_former_instance_dataset_mapper.py:19)."""

    def __call__(self, record: Dict, rng: np.random.RandomState) -> Optional[Dict]:
        from .coco_instance_new_baseline import _mask_from_segmentation

        img = self._load_image(record["file_name"], rng)
        if img is None:
            return None
        h, w = img.shape[:2]
        rec = self._geometry(rng, h, w)
        if self.color_aug and self.is_train:
            img = color_aug_ssd(rng, img)
        image = apply_record_to_image(img, rec, pad_value=128.0)
        ph, pw = self._canvas(rec)
        canvas = np.full((ph, pw, 3), 128, np.uint8)
        canvas[: image.shape[0], : image.shape[1]] = image

        n_cap = self.max_instances
        st = self.gt_mask_stride
        mh, mw = (ph + st - 1) // st, (pw + st - 1) // st
        labels = np.zeros((n_cap,), np.int32)
        masks = np.zeros((n_cap, mh, mw), bool)
        valid = np.zeros((n_cap,), bool)
        i = 0
        for a in record.get("annotations", []):
            if a.get("iscrowd", 0) or i >= n_cap:
                continue
            m = _mask_from_segmentation(a.get("segmentation"), rec, st)
            if m is None or not m.any():
                continue
            masks[i, : m.shape[0], : m.shape[1]] = m
            labels[i] = a["category_id"]
            valid[i] = True
            i += 1
        return {
            "image": canvas, "labels": labels, "masks": masks,
            "boxes": np.zeros((n_cap, 4), np.float32), "valid": valid,
            "image_id": record.get("image_id", -1),
            "height": record.get("height", h), "width": record.get("width", w),
        }


@DATASET_MAPPER_REGISTRY.register(name="coco_panoptic_lsj")
class COCOPanopticNewBaselineDatasetMapper:
    """LSJ for panoptic (reference coco_panoptic_new_baseline_dataset_mapper.py:51)."""

    def __init__(self, cfg, is_train=True, max_instances: int = 100):
        self.is_train = is_train
        self.image_size = cfg.INPUT.IMAGE_SIZE
        self.min_scale = cfg.INPUT.MIN_SCALE
        self.max_scale = cfg.INPUT.MAX_SCALE
        self.flip = cfg.INPUT.RANDOM_FLIP != "none"
        self.fmt = cfg.INPUT.FORMAT
        self.max_instances = max_instances
        self.gt_mask_stride = resolve_gt_mask_stride(cfg)

    def __call__(self, record: Dict, rng: np.random.RandomState) -> Optional[Dict]:
        img = cv2.imread(record["file_name"], cv2.IMREAD_COLOR)
        if img is None:
            return None
        if self.fmt == "RGB":
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        pan = cv2.imread(record["pan_seg_file_name"], cv2.IMREAD_COLOR)
        if pan is None:
            return None
        pan = cv2.cvtColor(pan, cv2.COLOR_BGR2RGB)
        h, w = img.shape[:2]
        rec = lsj_transform(rng, h, w, self.image_size, self.min_scale,
                            self.max_scale, self.flip)
        image = apply_record_to_image(img, rec, pad_value=128.0)
        pan_t = _apply_to_sem_seg(rgb2id(pan).astype(np.int64), rec, 0)

        n_cap = self.max_instances
        st = self.gt_mask_stride
        ms = (self.image_size + st - 1) // st
        labels = np.zeros((n_cap,), np.int32)
        masks = np.zeros((n_cap, ms, ms), bool)
        valid = np.zeros((n_cap,), bool)
        i = 0
        for seg in record.get("segments_info", []):
            if seg.get("iscrowd", 0) or i >= n_cap:
                continue
            m = block_any_pool(pan_t == seg["id"], st)
            if not m.any():
                continue
            masks[i, : m.shape[0], : m.shape[1]] = m
            labels[i] = seg["category_id"]
            valid[i] = True
            i += 1
        return {
            "image": np.ascontiguousarray(image), "labels": labels, "masks": masks,
            "boxes": np.zeros((n_cap, 4), np.float32), "valid": valid,
            "image_id": record.get("image_id", -1),
            "height": record.get("height", h), "width": record.get("width", w),
        }
