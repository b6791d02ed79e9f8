"""Host-side (numpy/cv2) augmentations mirroring the d2 transforms the
reference uses (SURVEY.md §2.5):

- LSJ recipe (coco_instance_new_baseline_dataset_mapper.py:37-66):
  RandomFlip -> ResizeScale(0.1-2.0, 1024) -> FixedSizeCrop(1024^2, pad 128)
- semantic recipe: ResizeShortestEdge + RandomCrop(+category-area constraint)
  + ColorAugSSD

Transforms operate on an image plus polygon/mask/sem-seg annotations. Each
returns (image, TransformRecord) where the record can re-apply the geometric
map to coordinates, polygons, masks, and segmentation rasters.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np


@dataclass
class TransformRecord:
    """Composable geometric transform: x' = sx*x + tx (after optional hflip),
    y' = sy*y + ty, with final canvas size (h, w)."""

    flip: bool
    src_w: int           # width at the time of the flip
    scale_x: float
    scale_y: float
    tx: float
    ty: float
    out_h: int
    out_w: int

    def apply_coords(self, coords: np.ndarray) -> np.ndarray:
        """coords: (..., 2) float (x, y)."""
        c = coords.astype(np.float64).copy()
        if self.flip:
            c[..., 0] = self.src_w - c[..., 0]
        c[..., 0] = c[..., 0] * self.scale_x + self.tx
        c[..., 1] = c[..., 1] * self.scale_y + self.ty
        return c

    def apply_box(self, box_xyxy: np.ndarray) -> np.ndarray:
        pts = box_xyxy.reshape(-1, 2, 2)
        pts = self.apply_coords(pts)
        x0 = pts[..., 0].min(-1)
        x1 = pts[..., 0].max(-1)
        y0 = pts[..., 1].min(-1)
        y1 = pts[..., 1].max(-1)
        out = np.stack([x0, y0, x1, y1], -1)
        out[..., 0::2] = np.clip(out[..., 0::2], 0, self.out_w)
        out[..., 1::2] = np.clip(out[..., 1::2], 0, self.out_h)
        return out


def _resize_image(img: np.ndarray, h: int, w: int, interp=cv2.INTER_LINEAR) -> np.ndarray:
    return cv2.resize(img, (w, h), interpolation=interp)


def random_flip(rng: np.random.RandomState, enabled: bool = True, prob: float = 0.5):
    return bool(enabled and rng.rand() < prob)


def lsj_transform(
    rng: np.random.RandomState,
    img_h: int,
    img_w: int,
    image_size: int = 1024,
    min_scale: float = 0.1,
    max_scale: float = 2.0,
    flip: bool = True,
) -> TransformRecord:
    """Geometry of RandomFlip + ResizeScale + FixedSizeCrop (d2 semantics)."""
    do_flip = random_flip(rng, flip)
    # d2 ResizeScale: random scale of the *target* size, then fit input inside
    scale = rng.uniform(min_scale, max_scale)
    target_h = image_size * scale
    target_w = image_size * scale
    output_scale = min(target_h / img_h, target_w / img_w)
    new_h = int(img_h * output_scale + 0.5)
    new_w = int(img_w * output_scale + 0.5)
    # d2 FixedSizeCrop: random crop if larger, pad bottom-right if smaller
    max_off_h = max(new_h - image_size, 0)
    max_off_w = max(new_w - image_size, 0)
    off_h = int(rng.uniform(0, 1) * (max_off_h + 1)) if max_off_h else 0
    off_w = int(rng.uniform(0, 1) * (max_off_w + 1)) if max_off_w else 0
    off_h = min(off_h, max_off_h)
    off_w = min(off_w, max_off_w)
    return TransformRecord(
        flip=do_flip, src_w=img_w,
        scale_x=new_w / img_w, scale_y=new_h / img_h,
        tx=-off_w, ty=-off_h, out_h=image_size, out_w=image_size)


def apply_record_to_image(
    img: np.ndarray, rec: TransformRecord, pad_value: float = 128.0
) -> np.ndarray:
    """Apply flip/resize/crop-or-pad to an HWC uint8/float image."""
    out = img[:, ::-1] if rec.flip else img
    new_h = int(round(img.shape[0] * rec.scale_y))
    new_w = int(round(img.shape[1] * rec.scale_x))
    out = _resize_image(out, new_h, new_w)
    if out.ndim == 2:
        out = out[:, :, None]
    y0, x0 = int(-rec.ty), int(-rec.tx)
    crop = out[y0: y0 + rec.out_h, x0: x0 + rec.out_w]
    canvas = np.full((rec.out_h, rec.out_w, out.shape[2]), pad_value, dtype=out.dtype)
    canvas[: crop.shape[0], : crop.shape[1]] = crop
    return canvas


def resize_shortest_edge(
    rng: Optional[np.random.RandomState],
    img_h: int,
    img_w: int,
    short_edge_length: Sequence[int],
    max_size: int = 1333,
    sample_style: str = "choice",
    flip: bool = False,
) -> TransformRecord:
    """d2 ResizeShortestEdge geometry (+ optional flip)."""
    if sample_style == "range":
        size = int(rng.randint(min(short_edge_length), max(short_edge_length) + 1))
    else:
        size = int(short_edge_length[rng.randint(len(short_edge_length))]) if rng is not None \
            else int(short_edge_length[0])
    scale = size / min(img_h, img_w)
    if img_h < img_w:
        new_h, new_w = size, scale * img_w
    else:
        new_h, new_w = scale * img_h, size
    if max(new_h, new_w) > max_size:
        s = max_size / max(new_h, new_w)
        new_h, new_w = new_h * s, new_w * s
    new_h = int(new_h + 0.5)
    new_w = int(new_w + 0.5)
    do_flip = random_flip(rng, flip) if rng is not None else False
    return TransformRecord(
        flip=do_flip, src_w=img_w, scale_x=new_w / img_w, scale_y=new_h / img_h,
        tx=0.0, ty=0.0, out_h=new_h, out_w=new_w)


def polygons_to_bitmask(
    polygons: List[np.ndarray], h: int, w: int
) -> np.ndarray:
    """Rasterize COCO polygons to a bool mask.

    Prefers the native C++ maskApi (mp_former_tpu/native/maskapi.cc) which
    follows pycocotools' subpixel rasterization scheme (the reference relies
    on pycocotools.frPyObjects, coco_instance_new_baseline_dataset_mapper.py
    :20-34); falls back to cv2.fillPoly (<=1px edge differences).
    """
    from ..native import polygons_to_mask_native

    native = polygons_to_mask_native(polygons, h, w)
    if native is not None:
        return native
    mask = np.zeros((h, w), dtype=np.uint8)
    pts = [np.round(np.asarray(p, np.float64).reshape(-1, 2)).astype(np.int32)
           for p in polygons if len(p) >= 6]
    if pts:
        cv2.fillPoly(mask, pts, 1)
    return mask.astype(bool)


def color_aug_ssd(rng: np.random.RandomState, img: np.ndarray) -> np.ndarray:
    """SSD-style photometric distortion (d2 ColorAugSSDTransform): random
    brightness/contrast/saturation/hue in random order. img: uint8 RGB."""
    img = img.astype(np.float32)

    def brightness(x):
        if rng.randint(2):
            x = x + rng.uniform(-32, 32)
        return x

    def contrast(x):
        if rng.randint(2):
            x = x * rng.uniform(0.5, 1.5)
        return x

    def saturation(x):
        if rng.randint(2):
            gray = x @ np.array([0.299, 0.587, 0.114], np.float32)
            alpha = rng.uniform(0.5, 1.5)
            x = x * alpha + gray[..., None] * (1 - alpha)
        return x

    img = brightness(img)
    if rng.randint(2):
        img = contrast(img)
        img = saturation(img)
    else:
        img = saturation(img)
        img = contrast(img)
    return np.clip(img, 0, 255).astype(np.uint8)


def resolve_gt_mask_stride(cfg) -> int:
    """TPU.GT_MASK_STRIDE with 0 = auto: ship GT masks at 1/4 canvas when
    the grid-mode loss is active (it resizes GT to the 1/4 prediction grid
    anyway), full resolution otherwise. Single source of truth for every
    mapper (the rule must not drift between them)."""
    stride = cfg.TPU.GT_MASK_STRIDE
    if stride == 0:
        stride = 4 if cfg.TPU.POINT_SAMPLE_MODE == "grid" else 1
    return stride


def block_any_pool(mask: np.ndarray, stride: int) -> np.ndarray:
    """Max ('any') pool a boolean mask by stride: a GT pixel anywhere in a
    stride x stride block marks the block. Unlike [::s, ::s] point sampling
    this cannot delete thin (1-2 px) structures — poles, fence lines — from
    the training targets."""
    if stride == 1:
        return mask
    h, w = mask.shape
    hp = (h + stride - 1) // stride * stride
    wp = (w + stride - 1) // stride * stride
    if (hp, wp) != (h, w):
        p = np.zeros((hp, wp), mask.dtype)
        p[:h, :w] = mask
        mask = p
    return mask.reshape(hp // stride, stride, wp // stride, stride).any((1, 3))
