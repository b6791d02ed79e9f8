"""Inference post-processors (reference maskformer_model.py:233-401).

`semantic_inference` and `instance_inference` are fully vectorized, static
shape, jit-friendly. `panoptic_inference` does the device-side heavy lifting
(softmax/sigmoid/argmax) under jit and keeps the inherently sequential
stuff-merging loop on host over <=Q segments (cheap; SURVEY.md §7.12).

`sem_seg_postprocess` mirrors reference d2 sem_seg_postprocess: crop the
padding region, then bilinear-resize to the original (height, width).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .utils.interp import resize


def upsample_masks(mask_pred: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """(B, Q, h, w) -> (B, Q, H, W) bilinear (reference :239-244)."""
    return resize(mask_pred, size, "bilinear")


def sem_seg_postprocess(result: jax.Array, img_size: Tuple[int, int],
                        out_h: int, out_w: int) -> jax.Array:
    """Crop the padded region then resize to output size (d2 equivalent,
    used at reference :256-259). result: (C, H_pad, W_pad)."""
    result = result[:, : img_size[0], : img_size[1]]
    return resize(result, (out_h, out_w), "bilinear")


def semantic_inference(mask_cls: jax.Array, mask_pred: jax.Array) -> jax.Array:
    """einsum softmax x sigmoid (reference :301-305).
    mask_cls: (..., Q, K+1), mask_pred: (..., Q, H, W) -> (..., K, H, W)."""
    probs = jax.nn.softmax(mask_cls, axis=-1)[..., :-1]
    masks = jax.nn.sigmoid(mask_pred)
    return jnp.einsum("...qc,...qhw->...chw", probs, masks)


class InstanceOutput(NamedTuple):
    """Fixed-size (topk) per-image instance predictions."""

    scores: jax.Array        # (topk,)
    pred_classes: jax.Array  # (topk,) int32
    pred_masks: jax.Array    # (topk, H, W) bool


def instance_inference(
    mask_cls: jax.Array,          # (Q, K+1)
    mask_pred: jax.Array,         # (Q, H, W) logits at output resolution
    num_classes: int,
    test_topk_per_image: int = 100,
    is_thing: jax.Array | None = None,  # (K,) bool — panoptic_on filter (:384-391)
) -> InstanceOutput:
    """Reference instance_inference :365-401, fully vectorized."""
    q = mask_cls.shape[0]
    scores = jax.nn.softmax(mask_cls, axis=-1)[:, :-1]  # (Q, K)
    flat = scores.reshape(-1)
    topk_scores, topk_idx = jax.lax.top_k(flat, test_topk_per_image)
    labels = topk_idx % num_classes
    query_idx = topk_idx // num_classes
    masks = mask_pred[query_idx]  # (topk, H, W)

    binary = masks > 0
    sig = jax.nn.sigmoid(masks)
    binf = binary.astype(sig.dtype)
    mask_scores = (sig * binf).sum(axis=(1, 2)) / (binf.sum(axis=(1, 2)) + 1e-6)
    scores_out = topk_scores * mask_scores
    if is_thing is not None:
        keep = is_thing[labels]
        scores_out = jnp.where(keep, scores_out, 0.0)
    return InstanceOutput(scores=scores_out, pred_classes=labels, pred_masks=binary)


def panoptic_inference_device(
    mask_cls: jax.Array,   # (Q, K+1)
    mask_pred: jax.Array,  # (Q, H, W) logits
    num_classes: int,
    object_mask_threshold: float,
):
    """Device part of reference panoptic_inference :307-341: scoring, keep
    filter, per-pixel argmax over prob-weighted masks, per-query areas."""
    probs = jax.nn.softmax(mask_cls, axis=-1)
    scores = probs.max(axis=-1)
    labels = probs.argmax(axis=-1)
    sig = jax.nn.sigmoid(mask_pred)
    keep = (labels != num_classes) & (scores > object_mask_threshold)

    prob_masks = jnp.where(keep[:, None, None], scores[:, None, None] * sig, -1.0)
    mask_ids = jnp.argmax(prob_masks, axis=0)  # (H, W); garbage if nothing kept
    binary = sig >= 0.5
    original_area = binary.sum(axis=(1, 2))
    # per-query assigned area & final mask area
    assigned = mask_ids[None, :, :] == jnp.arange(mask_pred.shape[0])[:, None, None]
    mask_area = assigned.sum(axis=(1, 2))
    final_mask = assigned & binary
    final_area = final_mask.sum(axis=(1, 2))
    return keep, labels, mask_ids, binary, mask_area, original_area, final_area


def panoptic_inference(
    mask_cls,
    mask_pred,
    num_classes: int,
    object_mask_threshold: float,
    overlap_threshold: float,
    is_thing: np.ndarray,  # (K,) bool, contiguous ids
) -> Tuple[np.ndarray, List[Dict]]:
    """Full panoptic fusion; sequential merge on host (reference :333-361).
    Returns (panoptic_seg (H, W) int32, segments_info)."""
    keep, labels, mask_ids, binary, mask_area, original_area, final_area = map(
        np.asarray,
        panoptic_inference_device(mask_cls, mask_pred, num_classes,
                                  object_mask_threshold),
    )
    h, w = binary.shape[-2:]
    panoptic_seg = np.zeros((h, w), dtype=np.int32)
    segments_info: List[Dict] = []
    if not keep.any():
        return panoptic_seg, segments_info

    current_segment_id = 0
    stuff_memory: Dict[int, int] = {}
    for k in range(labels.shape[0]):
        if not keep[k]:
            continue
        pred_class = int(labels[k])
        isthing = bool(is_thing[pred_class])
        if mask_area[k] > 0 and original_area[k] > 0 and final_area[k] > 0:
            if mask_area[k] / original_area[k] < overlap_threshold:
                continue
            mask = (mask_ids == k) & binary[k]
            if not isthing:
                if pred_class in stuff_memory:
                    panoptic_seg[mask] = stuff_memory[pred_class]
                    continue
                stuff_memory[pred_class] = current_segment_id + 1
            current_segment_id += 1
            panoptic_seg[mask] = current_segment_id
            segments_info.append(
                {"id": current_segment_id, "isthing": isthing,
                 "category_id": pred_class})
    return panoptic_seg, segments_info
