"""VideoMaskFormer meta-arch (reference mask2former_video/video_maskformer_model.py:24-287).

Clip frames are flattened into the batch dim for backbone + pixel decoder
(:180-188); the temporal decoder regroups them. Targets are per-video tubes
(N, T, H, W) with a slot valid if its id != -1 in any frame (:227-253).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.meta_arch.maskformer import build_backbone, build_sem_seg_head
from ..utils.registry import META_ARCH_REGISTRY


class VideoTargets(NamedTuple):
    labels: jax.Array   # (B, N)
    masks: jax.Array    # (B, N, T, H, W) bool
    valid: jax.Array    # (B, N)

    @property
    def num_instances(self) -> int:
        return self.labels.shape[1]


@META_ARCH_REGISTRY.register()
class VideoMaskFormer(nn.Module):
    backbone: nn.Module
    sem_seg_head: nn.Module
    num_frames: int = 2
    pixel_mean: Tuple[float, ...] = (123.675, 116.280, 103.530)
    pixel_std: Tuple[float, ...] = (58.395, 57.120, 57.375)
    num_queries: int = 100
    test_topk: int = 10

    @classmethod
    def from_config(cls, cfg):
        backbone = build_backbone(cfg)
        head = build_sem_seg_head(cfg, backbone.output_shape())
        return cls(
            backbone=backbone,
            sem_seg_head=head,
            num_frames=cfg.INPUT.SAMPLING_FRAME_NUM,
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            num_queries=cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES,
        )

    @nn.compact
    def __call__(self, images: jax.Array, targets: Optional[VideoTargets] = None,
                 *, train: bool = False, frame_valid: Optional[jax.Array] = None,
                 dn_groups: Optional[int] = None):
        """images: (B, T, H, W, 3) raw RGB. frame_valid (B, T) bool marks
        padding frames of a bucketed clip (whole-clip inference, reference
        video_maskformer_model.py:255-287 feeds clips unpadded). dn_groups is
        accepted for train-step compatibility and ignored — the reference
        video stack has no DN/MP path (video_maskformer_model.py:24-287)."""
        b, t, h, w, _ = images.shape
        if not jnp.issubdtype(images.dtype, jnp.floating):
            images = images.astype(jnp.float32)  # uint8 host transfers
        mean = jnp.asarray(self.pixel_mean, images.dtype)
        std = jnp.asarray(self.pixel_std, images.dtype)
        x = ((images - mean) / std).reshape(b * t, h, w, 3)
        features = self.backbone(x)
        kw = {} if frame_valid is None else {"frame_valid": frame_valid}
        return self.sem_seg_head(features, None, train=train, **kw)
