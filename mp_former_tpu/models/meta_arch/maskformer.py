"""MaskFormer meta-architecture (reference maskformer_model.py:20-401).

The flax module covers normalize -> backbone -> head (train and eval both
return the raw prediction dict; losses live in `modeling/criterion.py` as a
pure function, and the three inference post-processors live in
`mp_former_tpu/inference.py` — panoptic fusion keeps its tiny sequential
merge on host, SURVEY.md §7.12).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...structures import DNArgs, Targets
from ...utils.registry import BACKBONE_REGISTRY, META_ARCH_REGISTRY, SEM_SEG_HEADS_REGISTRY
from .mask_former_head import MaskFormerHead


def build_backbone(cfg):
    name = cfg.MODEL.BACKBONE.NAME
    return BACKBONE_REGISTRY.get(name)(cfg)


def build_sem_seg_head(cfg, input_shape):
    name = cfg.MODEL.SEM_SEG_HEAD.NAME
    return SEM_SEG_HEADS_REGISTRY.get(name).from_config(cfg, input_shape)


@META_ARCH_REGISTRY.register()
class MaskFormer(nn.Module):
    backbone: nn.Module
    sem_seg_head: nn.Module
    pixel_mean: Tuple[float, ...] = (123.675, 116.280, 103.530)
    pixel_std: Tuple[float, ...] = (58.395, 57.120, 57.375)
    size_divisibility: int = 32
    num_queries: int = 100
    # DN (MP) training (reference from_config :121-122)
    scalar: int = 5
    noise_scale: float = 0.2
    # inference switches
    semantic_on: bool = False
    instance_on: bool = True
    panoptic_on: bool = False
    object_mask_threshold: float = 0.8
    overlap_threshold: float = 0.8
    test_topk_per_image: int = 100

    @classmethod
    def from_config(cls, cfg):
        backbone = build_backbone(cfg)
        head = build_sem_seg_head(cfg, backbone.output_shape())
        return cls(
            backbone=backbone,
            sem_seg_head=head,
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            size_divisibility=cfg.MODEL.MASK_FORMER.SIZE_DIVISIBILITY,
            num_queries=cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES,
            scalar=cfg.MODEL.DN.NUM_DN,
            noise_scale=cfg.MODEL.DN.NOISE_SCALE,
            semantic_on=cfg.MODEL.MASK_FORMER.TEST.SEMANTIC_ON,
            instance_on=cfg.MODEL.MASK_FORMER.TEST.INSTANCE_ON,
            panoptic_on=cfg.MODEL.MASK_FORMER.TEST.PANOPTIC_ON,
            object_mask_threshold=cfg.MODEL.MASK_FORMER.TEST.OBJECT_MASK_THRESHOLD,
            overlap_threshold=cfg.MODEL.MASK_FORMER.TEST.OVERLAP_THRESHOLD,
            test_topk_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
        )

    @nn.compact
    def __call__(
        self,
        images: jax.Array,                 # (B, H, W, 3) raw RGB, padded to /32
        targets: Optional[Targets] = None,
        *,
        train: bool = False,
        dn_groups=None,
    ) -> Dict:
        """dn_groups: host-computed (groups, batch_max_gt) for NUM_DN >= 100
        configs (engine.train_step.compute_dn_groups; reference decoder
        :973-974). A bare int (legacy) is accepted as groups-only."""
        if not jnp.issubdtype(images.dtype, jnp.floating):
            images = images.astype(jnp.float32)  # uint8 host transfers
        mean = jnp.asarray(self.pixel_mean, images.dtype)
        std = jnp.asarray(self.pixel_std, images.dtype)
        x = (images - mean) / std
        features = self.backbone(x)
        dn_args = None
        if train and targets is not None:
            groups, batch_max = (dn_groups if isinstance(dn_groups, tuple)
                                 else (dn_groups, None))
            dn_args = DNArgs(targets=targets, scalar=self.scalar,
                             noise_scale=self.noise_scale, groups=groups,
                             batch_max=batch_max)
        return self.sem_seg_head(features, dn_args, train=train)
