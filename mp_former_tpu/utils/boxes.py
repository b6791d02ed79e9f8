"""Box utilities (reference util/box_ops.py — only the used subset)."""

import jax.numpy as jnp


def box_xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """(.., 4) xyxy → cxcywh (reference util/box_ops.py, used at
    maskformer_model.py:295)."""
    x0, y0, x1, y1 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1)


def box_cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """Tight xyxy boxes around binary masks (torchvision masks_to_boxes
    semantics; used by the LSJ mapper to recompute boxes,
    coco_instance_new_baseline_dataset_mapper.py:177).

    masks: (N, H, W) bool/float. Empty masks give zero boxes.
    """
    n, h, w = masks.shape
    m = masks > 0.5
    any_row = m.any(axis=2)  # (N, H)
    any_col = m.any(axis=1)  # (N, W)
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    big = jnp.iinfo(jnp.int32).max
    y0 = jnp.min(jnp.where(any_row, ys[None, :], big), axis=1)
    y1 = jnp.max(jnp.where(any_row, ys[None, :], -1), axis=1)
    x0 = jnp.min(jnp.where(any_col, xs[None, :], big), axis=1)
    x1 = jnp.max(jnp.where(any_col, xs[None, :], -1), axis=1)
    empty = ~m.any(axis=(1, 2))
    boxes = jnp.stack([x0, y0, x1, y1], axis=-1).astype(jnp.float32)
    return jnp.where(empty[:, None], 0.0, boxes)
