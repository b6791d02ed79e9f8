"""Per-pixel FCN baselines from the MaskFormer paper (reference
modeling/meta_arch/per_pixel_baseline.py:18-243 — registered but not used by
any shipped config).

PerPixelBaselineHead: pixel decoder -> 1x1 conv -> per-pixel logits at 1/4,
upsampled to input size; cross-entropy training with an ignore label.
PerPixelBaselinePlusHead: adds a transformer predictor whose per-query mask
logits + class probs are combined into per-pixel logits (deep supervision).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.interp import resize_nhwc
from ...utils.registry import SEM_SEG_HEADS_REGISTRY
from ...utils.shape_spec import ShapeSpec
from .mask_former_head import build_pixel_decoder


def per_pixel_ce_loss(logits: jax.Array, sem_seg: jax.Array,
                      ignore_value: int = 255) -> jax.Array:
    """logits (B, H, W, K), sem_seg (B, H, W) int with ignore_value."""
    valid = sem_seg != ignore_value
    safe = jnp.where(valid, sem_seg, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / jnp.maximum(valid.sum(), 1)


@SEM_SEG_HEADS_REGISTRY.register()
class PerPixelBaselineHead(nn.Module):
    pixel_decoder: nn.Module
    num_classes: int
    ignore_value: int = 255
    loss_weight: float = 1.0
    common_stride: int = 4

    @classmethod
    def from_config(cls, cfg, input_shape: Dict[str, ShapeSpec]):
        return cls(
            pixel_decoder=build_pixel_decoder(cfg, input_shape),
            num_classes=cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
            ignore_value=cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE,
            loss_weight=cfg.MODEL.SEM_SEG_HEAD.LOSS_WEIGHT,
        )

    @nn.compact
    def __call__(self, features: Dict[str, jax.Array], dn_args=None,
                 *, train: bool = False):
        mask_features, _, _ = self.pixel_decoder(features, train=train)
        logits = nn.Conv(
            self.num_classes, (1, 1),
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            name="predictor")(mask_features)
        up = resize_nhwc(
            logits,
            (logits.shape[1] * self.common_stride,
             logits.shape[2] * self.common_stride), "bilinear")
        return {"sem_seg_logits": up}


@SEM_SEG_HEADS_REGISTRY.register()
class PerPixelBaselinePlusHead(PerPixelBaselineHead):
    """Baseline + transformer predictor supervision (reference :127-243)."""

    transformer_in_feature: str = "res5"
    deep_supervision: bool = True

    @classmethod
    def from_config(cls, cfg, input_shape: Dict[str, ShapeSpec]):
        return cls(
            pixel_decoder=build_pixel_decoder(cfg, input_shape),
            num_classes=cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
            ignore_value=cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE,
            loss_weight=cfg.MODEL.SEM_SEG_HEAD.LOSS_WEIGHT,
            transformer_in_feature=cfg.MODEL.MASK_FORMER.TRANSFORMER_IN_FEATURE,
            deep_supervision=cfg.MODEL.MASK_FORMER.DEEP_SUPERVISION,
        )

    @nn.compact
    def __call__(self, features: Dict[str, jax.Array], dn_args=None,
                 *, train: bool = False):
        from ..transformer_decoder.maskformer_transformer_decoder import \
            StandardTransformerDecoder

        mask_features, _, _ = self.pixel_decoder(features, train=train)
        in_feat = features[self.transformer_in_feature]
        predictor = StandardTransformerDecoder(
            in_channels=in_feat.shape[-1], num_classes=self.num_classes,
            mask_dim=mask_features.shape[-1],
            deep_supervision=self.deep_supervision, name="predictor")
        out = predictor([in_feat], mask_features, train=train)
        # per-pixel logits = sum_q p(class|q) * sigmoid(mask_q)
        probs = jax.nn.softmax(out["pred_logits"], axis=-1)[..., :-1]
        masks = jax.nn.sigmoid(out["pred_masks"])
        sem = jnp.einsum("bqk,bqhw->bhwk", probs, masks)
        logits = jnp.log(jnp.clip(sem, 1e-8))  # logits-like for CE
        up = resize_nhwc(
            logits, (logits.shape[1] * self.common_stride,
                     logits.shape[2] * self.common_stride), "bilinear")
        out["sem_seg_logits"] = up
        return out
