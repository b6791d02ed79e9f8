"""FPN pixel decoders (reference pixel_decoder/fpn.py:37-312).

`BasePixelDecoder`: lateral 1x1 + output 3x3 convs top-down over res2-5 with
nearest upsampling; `TransformerEncoderPixelDecoder` adds a 6-layer vanilla
transformer encoder on res5 (the original MaskFormer design).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.interp import resize_nhwc
from ...utils.registry import PIXEL_DECODER_REGISTRY
from ...utils.shape_spec import ShapeSpec
from ...utils import compute_dtype
from ..transformer_decoder.position_encoding import position_embedding_sine
from ..transformer_decoder.primitives import MultiheadAttention


class _ConvGNRelu(nn.Module):
    features: int
    kernel: int
    norm: str = "GN"
    relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        use_bias = self.norm == ""
        pad = (self.kernel - 1) // 2
        y = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=[(pad, pad), (pad, pad)], use_bias=use_bias,
                    kernel_init=nn.initializers.xavier_uniform(),
                    dtype=self.dtype, name="conv")(x)
        if not use_bias:
            y = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="gn")(y)
        return nn.relu(y) if self.relu else y


class TransformerEncoderLayerVanilla(nn.Module):
    """torch nn.TransformerEncoderLayer-style block (DETR transformer.py)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    normalize_before: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos, *, train: bool = False):
        drop = nn.Dropout(self.dropout, deterministic=not train)

        def attend(x):
            qk = x + pos
            return MultiheadAttention(self.d_model, self.nhead,
                                      dropout=self.dropout, dtype=self.dtype,
                                      name="self_attn")(qk, qk, x, train=train)

        def ffn(x):
            h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
            h = drop(nn.relu(h))
            return nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)

        if self.normalize_before:
            src = src + drop(attend(nn.LayerNorm(dtype=self.dtype, name="norm1")(src)))
            src = src + drop(ffn(nn.LayerNorm(dtype=self.dtype, name="norm2")(src)))
            return src
        src = nn.LayerNorm(dtype=self.dtype, name="norm1")(src + drop(attend(src)))
        src = nn.LayerNorm(dtype=self.dtype, name="norm2")(src + drop(ffn(src)))
        return src


@PIXEL_DECODER_REGISTRY.register()
class BasePixelDecoder(nn.Module):
    input_shape: Dict[str, ShapeSpec]
    conv_dim: int = 256
    mask_dim: int = 256
    norm: str = "GN"
    maskformer_num_feature_levels: int = 3
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_config(cls, cfg, input_shape):
        return cls(
            input_shape={k: v for k, v in input_shape.items()
                         if k in cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES},
            conv_dim=cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM,
            mask_dim=cfg.MODEL.SEM_SEG_HEAD.MASK_DIM,
            norm=cfg.MODEL.SEM_SEG_HEAD.NORM,
            dtype=compute_dtype(cfg),
        )

    def _top_block(self, x, *, train: bool):
        """Hook: processing of the lowest-res feature (overridden by the
        transformer variant). Returns (y, transformer_encoder_features)."""
        n = len(self.input_shape)
        y = _ConvGNRelu(self.conv_dim, 3, self.norm, dtype=self.dtype,
                        name=f"layer_{n}")(x)
        return y, None

    @nn.compact
    def __call__(self, features: Dict[str, jax.Array], *, train: bool = False):
        in_features = sorted(self.input_shape, key=lambda k: self.input_shape[k].stride)
        multi_scale = []
        y = None
        tx_feat = None
        for i, f in enumerate(in_features[::-1]):
            idx = len(in_features) - i  # adapter_/layer_ numbering (1-based, res order)
            x = features[f].astype(self.dtype)
            if i == 0:
                y, tx_feat = self._top_block(x, train=train)
            else:
                lateral = _ConvGNRelu(self.conv_dim, 1, self.norm, relu=False,
                                      dtype=self.dtype, name=f"adapter_{idx}")(x)
                y = lateral + resize_nhwc(y, (x.shape[1], x.shape[2]), "nearest")
                y = _ConvGNRelu(self.conv_dim, 3, self.norm, dtype=self.dtype,
                                name=f"layer_{idx}")(y)
            if len(multi_scale) < self.maskformer_num_feature_levels:
                multi_scale.append(y)
        mask_features = nn.Conv(
            self.mask_dim, (3, 3), padding=[(1, 1), (1, 1)],
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype, name="mask_features")(y)
        return mask_features, tx_feat, multi_scale


@PIXEL_DECODER_REGISTRY.register()
class TransformerEncoderPixelDecoder(BasePixelDecoder):
    transformer_dropout: float = 0.1
    transformer_nheads: int = 8
    transformer_dim_feedforward: int = 2048
    transformer_enc_layers: int = 6
    transformer_pre_norm: bool = False

    @classmethod
    def from_config(cls, cfg, input_shape):
        return cls(
            input_shape={k: v for k, v in input_shape.items()
                         if k in cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES},
            conv_dim=cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM,
            mask_dim=cfg.MODEL.SEM_SEG_HEAD.MASK_DIM,
            norm=cfg.MODEL.SEM_SEG_HEAD.NORM,
            transformer_dropout=cfg.MODEL.MASK_FORMER.DROPOUT,
            transformer_nheads=cfg.MODEL.MASK_FORMER.NHEADS,
            transformer_dim_feedforward=cfg.MODEL.MASK_FORMER.DIM_FEEDFORWARD,
            transformer_enc_layers=cfg.MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS,
            transformer_pre_norm=cfg.MODEL.MASK_FORMER.PRE_NORM,
            dtype=compute_dtype(cfg),
        )

    def _top_block(self, x, *, train: bool):
        b, h, w, _ = x.shape
        proj = nn.Conv(self.conv_dim, (1, 1),
                       kernel_init=nn.initializers.xavier_uniform(),
                       dtype=self.dtype, name="input_proj")(x)
        pe = position_embedding_sine(h, w, self.conv_dim // 2, dtype=self.dtype)
        src = proj.reshape(b, h * w, self.conv_dim)
        pos = jnp.broadcast_to(pe.reshape(1, h * w, -1), src.shape)
        for i in range(self.transformer_enc_layers):
            src = TransformerEncoderLayerVanilla(
                self.conv_dim, self.transformer_nheads,
                self.transformer_dim_feedforward, self.transformer_dropout,
                self.transformer_pre_norm, dtype=self.dtype,
                name=f"transformer_layer_{i}")(src, pos, train=train)
        tx = src.reshape(b, h, w, self.conv_dim)
        n = len(self.input_shape)
        y = _ConvGNRelu(self.conv_dim, 3, self.norm, dtype=self.dtype,
                        name=f"layer_{n}")(tx)
        return y, tx
