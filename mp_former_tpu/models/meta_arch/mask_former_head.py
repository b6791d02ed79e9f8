"""MaskFormerHead — pixel decoder + transformer predictor glue
(reference modeling/meta_arch/mask_former_head.py:18-132)."""

from __future__ import annotations

from typing import Dict, Optional

import jax
from flax import linen as nn

from ...structures import DNArgs
from ...utils.registry import PIXEL_DECODER_REGISTRY, SEM_SEG_HEADS_REGISTRY
from ...utils.shape_spec import ShapeSpec
from ..transformer_decoder.mask2former_decoder import build_transformer_decoder


def build_pixel_decoder(cfg, input_shape):
    """Reference pixel_decoder/fpn.py:21-33."""
    name = cfg.MODEL.SEM_SEG_HEAD.PIXEL_DECODER_NAME
    return PIXEL_DECODER_REGISTRY.get(name).from_config(cfg, input_shape)


@SEM_SEG_HEADS_REGISTRY.register()
class MaskFormerHead(nn.Module):
    pixel_decoder: nn.Module
    predictor: nn.Module
    transformer_in_feature: str = "multi_scale_pixel_decoder"
    num_classes: int = 80
    ignore_value: int = 255
    loss_weight: float = 1.0

    @classmethod
    def from_config(cls, cfg, input_shape: Dict[str, ShapeSpec]):
        if cfg.MODEL.MASK_FORMER.TRANSFORMER_IN_FEATURE == "transformer_encoder":
            in_ch = cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM
        elif cfg.MODEL.MASK_FORMER.TRANSFORMER_IN_FEATURE == "pixel_embedding":
            in_ch = cfg.MODEL.SEM_SEG_HEAD.MASK_DIM
        elif cfg.MODEL.MASK_FORMER.TRANSFORMER_IN_FEATURE == "multi_scale_pixel_decoder":
            in_ch = cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM
        else:
            in_ch = input_shape[cfg.MODEL.MASK_FORMER.TRANSFORMER_IN_FEATURE].channels
        return cls(
            pixel_decoder=build_pixel_decoder(cfg, input_shape),
            predictor=build_transformer_decoder(cfg, in_ch, mask_classification=True),
            transformer_in_feature=cfg.MODEL.MASK_FORMER.TRANSFORMER_IN_FEATURE,
            num_classes=cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
            ignore_value=cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE,
            loss_weight=cfg.MODEL.SEM_SEG_HEAD.LOSS_WEIGHT,
        )

    @nn.compact
    def __call__(
        self,
        features: Dict[str, jax.Array],
        dn_args: Optional[DNArgs] = None,
        *,
        train: bool = False,
        **predictor_kwargs,
    ):
        """predictor_kwargs are forwarded to the transformer predictor (the
        video decoder accepts frame_valid= for padded-clip inference)."""
        mask_features, tx_features, multi_scale = self.pixel_decoder(
            features, train=train)
        if self.transformer_in_feature == "multi_scale_pixel_decoder":
            return self.predictor(multi_scale, mask_features, dn_args,
                                  train=train, **predictor_kwargs)
        if self.transformer_in_feature == "transformer_encoder":
            return self.predictor([tx_features], mask_features, dn_args,
                                  train=train, **predictor_kwargs)
        if self.transformer_in_feature == "pixel_embedding":
            return self.predictor([mask_features], mask_features, dn_args,
                                  train=train, **predictor_kwargs)
        return self.predictor(
            [features[self.transformer_in_feature]], mask_features, dn_args,
            train=train, **predictor_kwargs)
