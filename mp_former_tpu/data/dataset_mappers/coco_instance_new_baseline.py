"""COCOInstanceNewBaselineDatasetMapper — LSJ mapper used by the released
recipe (reference coco_instance_new_baseline_dataset_mapper.py, selected via
INPUT.DATASET_MAPPER_NAME 'coco_instance_lsj', train_net.py:226-229).

Pipeline per record (reference :37-66, :120-189): RandomFlip -> ResizeScale
(0.1-2.0 of IMAGE_SIZE) -> FixedSizeCrop(IMAGE_SIZE^2) on image; crowd
annotations dropped; polygons transformed pointwise and rasterized at the
final canvas; boxes recomputed from masks (:177); empty masks filtered
(:179). Output is a static-shape padded Targets row (TPU requirement).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import cv2
import numpy as np

from ...utils.registry import DATASET_MAPPER_REGISTRY
from ..transforms import (
    TransformRecord, apply_record_to_image, block_any_pool, lsj_transform,
    polygons_to_bitmask, resolve_gt_mask_stride)


def _mask_from_segmentation(seg, rec: TransformRecord,
                            stride: int = 1) -> Optional[np.ndarray]:
    """Transform + rasterize one annotation's segmentation at the output
    canvas. stride > 1 rasterizes at 1/stride of the canvas — the criterion's
    grid-mode losses and the DN attention masks only ever consume GT at
    <= 1/4 canvas resolution, so stride 4 is lossless for the default loss
    path while cutting host rasterization + device transfer 16x."""
    h = (rec.out_h + stride - 1) // stride
    w = (rec.out_w + stride - 1) // stride
    if isinstance(seg, list):  # polygons
        polys = []
        for p in seg:
            pts = np.asarray(p, np.float64).reshape(-1, 2)
            pts = rec.apply_coords(pts)
            polys.append((pts / stride).reshape(-1))
        return polygons_to_bitmask(polys, h, w)
    if isinstance(seg, dict):  # RLE — uncompressed counts only (no pycocotools)
        if isinstance(seg.get("counts"), list):
            mh, mw = seg["size"]
            flat = np.zeros(mh * mw, dtype=np.uint8)
            pos, val = 0, 0
            for c in seg["counts"]:
                flat[pos: pos + c] = val
                pos += c
                val = 1 - val
            mask = flat.reshape(mw, mh).T  # COCO RLE is column-major
            m = _transform_bitmask(mask.astype(bool), rec)
            if stride > 1:
                # any-pool, not nearest-resize: point sampling can delete
                # thin structures from the GT
                m = block_any_pool(m, stride)[:h, :w]
            return m
    return None


def _transform_bitmask(mask: np.ndarray, rec: TransformRecord) -> np.ndarray:
    m = mask.astype(np.uint8)
    if rec.flip:
        m = m[:, ::-1]
    new_h = int(round(m.shape[0] * rec.scale_y))
    new_w = int(round(m.shape[1] * rec.scale_x))
    m = cv2.resize(m, (new_w, new_h), interpolation=cv2.INTER_NEAREST)
    y0, x0 = int(-rec.ty), int(-rec.tx)
    crop = m[y0: y0 + rec.out_h, x0: x0 + rec.out_w]
    canvas = np.zeros((rec.out_h, rec.out_w), dtype=np.uint8)
    canvas[: crop.shape[0], : crop.shape[1]] = crop
    return canvas.astype(bool)


def _masks_to_boxes_np(masks: np.ndarray) -> np.ndarray:
    n = masks.shape[0]
    boxes = np.zeros((n, 4), np.float32)
    for i, m in enumerate(masks):
        ys, xs = np.nonzero(m)
        if len(ys):
            boxes[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
    return boxes


@DATASET_MAPPER_REGISTRY.register(name="coco_instance_lsj")
class COCOInstanceNewBaselineDatasetMapper:
    def __init__(self, cfg, is_train: bool = True, max_instances: int = 100):
        self.is_train = is_train
        self.image_size = cfg.INPUT.IMAGE_SIZE
        self.min_scale = cfg.INPUT.MIN_SCALE
        self.max_scale = cfg.INPUT.MAX_SCALE
        self.flip = cfg.INPUT.RANDOM_FLIP != "none"
        self.max_instances = max_instances
        self.img_format = cfg.INPUT.FORMAT
        # 0 = auto: 1/4-res GT masks when the grid-mode loss (which resizes
        # GT to the 1/4 prediction grid anyway) is active, full-res otherwise
        self.gt_mask_stride = resolve_gt_mask_stride(cfg)

    def __call__(self, record: Dict, rng: np.random.RandomState) -> Optional[Dict]:
        img = cv2.imread(record["file_name"], cv2.IMREAD_COLOR)
        if img is None:
            return None
        if self.img_format == "RGB":
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        h, w = img.shape[:2]
        rec = lsj_transform(rng, h, w, self.image_size, self.min_scale,
                            self.max_scale, self.flip)
        image = apply_record_to_image(img, rec, pad_value=128.0)

        n_cap = self.max_instances
        s = self.gt_mask_stride
        ms = (self.image_size + s - 1) // s
        labels = np.zeros((n_cap,), np.int32)
        masks = np.zeros((n_cap, ms, ms), bool)
        boxes = np.zeros((n_cap, 4), np.float32)
        valid = np.zeros((n_cap,), bool)
        if self.is_train:
            idx = 0
            for a in record.get("annotations", []):
                if a.get("iscrowd", 0) == 1:
                    continue
                if idx >= n_cap:
                    break
                m = _mask_from_segmentation(a.get("segmentation"), rec, s)
                if m is None or not m.any():
                    continue
                masks[idx] = m
                labels[idx] = a["category_id"]
                valid[idx] = True
                idx += 1
            b = _masks_to_boxes_np(masks[:idx])
            # cxcywh normalized (reference maskformer_model.py:295) — the
            # normalization cancels the mask stride
            size = np.array([ms, ms, ms, ms], np.float32)
            cx = (b[:, 0] + b[:, 2]) / 2
            cy = (b[:, 1] + b[:, 3]) / 2
            bw = b[:, 2] - b[:, 0]
            bh = b[:, 3] - b[:, 1]
            boxes[:idx] = np.stack([cx, cy, bw, bh], -1) / size

        return {
            # uint8: images ship to device raw; the model casts (4x fewer
            # host-link bytes than float32, and this runtime retains every
            # transfer's host staging buffer)
            "image": np.ascontiguousarray(image),
            "labels": labels,
            "masks": masks,
            "boxes": boxes,
            "valid": valid,
            "image_id": record.get("image_id", -1),
            "height": record.get("height", h),
            "width": record.get("width", w),
        }
