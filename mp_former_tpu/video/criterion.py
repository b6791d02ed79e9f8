"""VideoSetCriterion + VideoHungarianMatcher (reference
mask2former_video/modeling/{criterion,matcher}.py).

Same point-sampled losses over spatio-temporal tubes: matcher samples the
shared random points per frame and flattens (Q, T*P) (matcher.py:113-133);
mask losses flatten matched pairs over (N*T, ...) rows with per-row
uncertainty sampling (criterion.py:140-186) and normalize by the TUBE count.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..models.criterion import SetCriterion
from ..models.matcher import (HungarianMatcher, batch_dice_cost,
                              batch_sigmoid_ce_cost, fill_invalid_columns)
from ..structures import Targets
from ..utils.interp import point_sample
from .video_maskformer import VideoTargets


class VideoHungarianMatcher(HungarianMatcher):
    def cost(self, pred_logits, pred_masks, targets: VideoTargets, rng):
        """pred_masks: (B, Q, T, h, w); targets.masks: (B, N, T, H, W)."""
        b, q = pred_logits.shape[:2]
        n = targets.labels.shape[1]
        t = pred_masks.shape[2]

        prob = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)
        cc = -jnp.take_along_axis(prob, targets.labels[:, None, :], axis=-1)

        coords = jax.random.uniform(rng, (b, self.num_points, 2))
        # sample per-frame at shared coords, flatten (Q, T*P)
        pm = pred_masks.astype(jnp.float32)
        out_pts = point_sample(
            jnp.moveaxis(pm.reshape(b, q * t, *pm.shape[3:]), 1, -1), coords)
        out_pts = jnp.moveaxis(out_pts, -1, 1).reshape(b, q, t * self.num_points)
        gm = targets.masks.astype(jnp.float32)
        tgt_pts = point_sample(
            jnp.moveaxis(gm.reshape(b, n * t, *gm.shape[3:]), 1, -1), coords)
        tgt_pts = jnp.moveaxis(tgt_pts, -1, 1).reshape(b, n, t * self.num_points)

        cm = batch_sigmoid_ce_cost(out_pts, tgt_pts)
        cd = batch_dice_cost(out_pts, tgt_pts)
        cost = self.cost_mask * cm + self.cost_class * cc + self.cost_dice * cd
        # ceiling (just above worst real cost), NOT a 1e6 sentinel: the
        # sentinel compresses real cost differences below the on-device
        # auction's epsilon, making tube matching effectively random
        return fill_invalid_columns(cost, targets.valid)


class VideoSetCriterion(SetCriterion):
    def loss_masks(self, pred_masks, qidx, gt_masks, valid, num_masks, rng):
        """Fold T into the pair dim: pred (B, Q, T, h, w), gt (B, N, T, H, W).
        Pair (n, t) uses query qidx[n] at frame t; validity per tube."""
        b, q, t, h, w = pred_masks.shape
        n = qidx.shape[1]
        pred_flat = pred_masks.reshape(b, q * t, h, w)
        qidx_t = (qidx[:, :, None] * t
                  + jnp.arange(t, dtype=qidx.dtype)[None, None, :]).reshape(b, n * t)
        gt_flat = gt_masks.reshape(b, n * t, *gt_masks.shape[3:])
        valid_t = jnp.broadcast_to(valid[:, :, None], (b, n, t)).reshape(b, n * t)
        return super().loss_masks(
            pred_flat, qidx_t, gt_flat, valid_t, num_masks, rng)

    def loss_masks_stacked(self, pred_masks, qidx, gt_masks, valid,
                           num_masks, rng):
        """Stacked form of the T-fold: pred (L, B, Q, T, h, w),
        qidx (L, B, N), gt (B, N, T, H, W)."""
        l, b, q, t, h, w = pred_masks.shape
        n = qidx.shape[2]
        pred_flat = pred_masks.reshape(l, b, q * t, h, w)
        qidx_t = (qidx[..., None] * t
                  + jnp.arange(t, dtype=qidx.dtype)).reshape(l, b, n * t)
        gt_flat = gt_masks.reshape(b, n * t, *gt_masks.shape[3:])
        valid_t = jnp.broadcast_to(valid[:, :, None], (b, n, t)).reshape(b, n * t)
        return super().loss_masks_stacked(
            pred_flat, qidx_t, gt_flat, valid_t, num_masks, rng)

    def __call__(self, outputs: Dict, targets: VideoTargets, rng,
                 num_masks=None, assignments=None) -> Dict:
        # reuse the image criterion driver: Targets carries (labels, masks,
        # boxes, valid); boxes unused by losses
        tgt = Targets(labels=targets.labels, masks=targets.masks,
                      boxes=jnp.zeros(targets.labels.shape + (4,), jnp.float32),
                      valid=targets.valid)
        return super().__call__(outputs, tgt, rng, num_masks,
                                assignments=assignments)


def build_video_criterion(cfg) -> VideoSetCriterion:
    class_weight = cfg.MODEL.MASK_FORMER.CLASS_WEIGHT
    dice_weight = cfg.MODEL.MASK_FORMER.DICE_WEIGHT
    mask_weight = cfg.MODEL.MASK_FORMER.MASK_WEIGHT
    matcher = VideoHungarianMatcher(
        cost_class=class_weight, cost_mask=mask_weight, cost_dice=dice_weight,
        num_points=cfg.MODEL.MASK_FORMER.TRAIN_NUM_POINTS)
    weight_dict = {"loss_ce": class_weight, "loss_mask": mask_weight,
                   "loss_dice": dice_weight}
    if cfg.MODEL.MASK_FORMER.DEEP_SUPERVISION:
        aux = {}
        for i in range(cfg.MODEL.MASK_FORMER.DEC_LAYERS - 1):
            aux.update({k + f"_{i}": v for k, v in weight_dict.items()})
        weight_dict.update(aux)
    return VideoSetCriterion(
        cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES, matcher=matcher,
        weight_dict=weight_dict,
        eos_coef=cfg.MODEL.MASK_FORMER.NO_OBJECT_WEIGHT,
        losses=["labels", "masks"],
        num_points=cfg.MODEL.MASK_FORMER.TRAIN_NUM_POINTS,
        oversample_ratio=cfg.MODEL.MASK_FORMER.OVERSAMPLE_RATIO,
        importance_sample_ratio=cfg.MODEL.MASK_FORMER.IMPORTANCE_SAMPLE_RATIO,
        # compact the (B * MAX_INSTANCES * T) pair set to the static budget
        # like the image path; the grid-mode loss is image-only (its ctx
        # assumes 4D pred_masks), so video stays on the reference-exact
        # random-point path
        max_pairs=cfg.TPU.MAX_PAIRS,
        point_sample_mode="random",
        point_matmul=cfg.TPU.POINT_MATMUL_SAMPLING)
