"""StandardTransformerDecoder — the original MaskFormer DETR-style decoder
(reference maskformer_transformer_decoder.py:30-171 + transformer.py DETR
encoder/decoder). Operates on a single feature level with learnable
query_embed positional queries; deep supervision over decoder layers.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import TRANSFORMER_DECODER_REGISTRY
from ...utils import compute_dtype
from .position_encoding import position_embedding_sine
from .primitives import MLP, MultiheadAttention


class _DETRDecoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    normalize_before: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos, *, train: bool = False):
        drop = nn.Dropout(self.dropout, deterministic=not train)

        def self_attend(x):
            qk = x + query_pos
            return MultiheadAttention(self.d_model, self.nhead,
                                      dropout=self.dropout, dtype=self.dtype,
                                      name="self_attn")(qk, qk, x, train=train)

        def cross_attend(x):
            return MultiheadAttention(self.d_model, self.nhead,
                                      dropout=self.dropout, dtype=self.dtype,
                                      name="multihead_attn")(
                x + query_pos, memory + pos, memory, train=train)

        def ffn(x):
            h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
            h = drop(nn.relu(h))
            return nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)

        if self.normalize_before:
            tgt = tgt + drop(self_attend(nn.LayerNorm(dtype=self.dtype, name="norm1")(tgt)))
            tgt = tgt + drop(cross_attend(nn.LayerNorm(dtype=self.dtype, name="norm2")(tgt)))
            tgt = tgt + drop(ffn(nn.LayerNorm(dtype=self.dtype, name="norm3")(tgt)))
            return tgt
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm1")(tgt + drop(self_attend(tgt)))
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm2")(tgt + drop(cross_attend(tgt)))
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm3")(tgt + drop(ffn(tgt)))
        return tgt


@TRANSFORMER_DECODER_REGISTRY.register()
class StandardTransformerDecoder(nn.Module):
    in_channels: int
    num_classes: int
    hidden_dim: int = 256
    num_queries: int = 100
    nheads: int = 8
    dropout: float = 0.1
    dim_feedforward: int = 2048
    enc_layers: int = 0
    dec_layers: int = 6
    pre_norm: bool = False
    deep_supervision: bool = True
    mask_dim: int = 256
    enforce_input_project: bool = False
    mask_classification: bool = True
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_config(cls, cfg, in_channels, mask_classification=True):
        return cls(
            in_channels=in_channels,
            mask_classification=mask_classification,
            num_classes=cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
            hidden_dim=cfg.MODEL.MASK_FORMER.HIDDEN_DIM,
            num_queries=cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES,
            nheads=cfg.MODEL.MASK_FORMER.NHEADS,
            dropout=cfg.MODEL.MASK_FORMER.DROPOUT,
            dim_feedforward=cfg.MODEL.MASK_FORMER.DIM_FEEDFORWARD,
            enc_layers=cfg.MODEL.MASK_FORMER.ENC_LAYERS,
            dec_layers=cfg.MODEL.MASK_FORMER.DEC_LAYERS,
            pre_norm=cfg.MODEL.MASK_FORMER.PRE_NORM,
            deep_supervision=cfg.MODEL.MASK_FORMER.DEEP_SUPERVISION,
            enforce_input_project=cfg.MODEL.MASK_FORMER.ENFORCE_INPUT_PROJ,
            mask_dim=cfg.MODEL.SEM_SEG_HEAD.MASK_DIM,
            dtype=compute_dtype(cfg),
        )

    @nn.compact
    def __call__(self, x: List[jax.Array], mask_features: jax.Array,
                 dn_args=None, *, train: bool = False):
        """x: [single feature level (B, H, W, C)]; mask_features NHWC 1/4."""
        feat = x[0].astype(self.dtype)
        b, h, w, _ = feat.shape
        C = self.hidden_dim

        if self.in_channels != C or self.enforce_input_project:
            feat = nn.Conv(C, (1, 1), kernel_init=nn.initializers.xavier_uniform(),
                           dtype=self.dtype, name="input_proj")(feat)
        src = feat.reshape(b, h * w, C)
        pe = position_embedding_sine(h, w, C // 2, dtype=self.dtype)
        pos = jnp.broadcast_to(pe.reshape(1, h * w, C), src.shape)

        # optional DETR encoder (ENC_LAYERS, 0 in shipped configs)
        from ..pixel_decoder.fpn import TransformerEncoderLayerVanilla
        for i in range(self.enc_layers):
            src = TransformerEncoderLayerVanilla(
                C, self.nheads, self.dim_feedforward, self.dropout,
                self.pre_norm, dtype=self.dtype, name=f"encoder_layer_{i}",
            )(src, pos, train=train)

        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (self.num_queries, C))
        qpos = jnp.broadcast_to(query_embed[None], (b, self.num_queries, C)).astype(self.dtype)
        tgt = jnp.zeros_like(qpos)

        decoder_norm = nn.LayerNorm(dtype=self.dtype, name="decoder_norm")
        intermediates = []
        for i in range(self.dec_layers):
            tgt = _DETRDecoderLayer(
                C, self.nheads, self.dim_feedforward, self.dropout,
                self.pre_norm, dtype=self.dtype, name=f"decoder_layer_{i}",
            )(tgt, src, pos, qpos, train=train)
            intermediates.append(decoder_norm(tgt))

        hs = intermediates if self.deep_supervision else [decoder_norm(tgt)]
        class_embed = nn.Dense(self.num_classes + 1, dtype=self.dtype, name="class_embed")
        mask_mlp = MLP(C, self.mask_dim, 3, dtype=self.dtype, name="mask_embed")

        out = {}
        logits = [class_embed(hq) for hq in hs] if self.mask_classification else None
        membs = [mask_mlp(hq) for hq in hs]
        masks = [jnp.einsum("bqc,bhwc->bqhw", m, mask_features.astype(m.dtype))
                 for m in membs]
        if self.mask_classification:
            out["pred_logits"] = logits[-1]
        out["pred_masks"] = masks[-1]
        if self.deep_supervision:
            out["aux_outputs"] = [
                {"pred_logits": a, "pred_masks": m}
                for a, m in zip(logits[:-1], masks[:-1])
            ]
        else:
            out["aux_outputs"] = []
        out["dn_out"] = None
        return out
