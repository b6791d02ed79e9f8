"""VideoMultiScaleMaskedTransformerDecoder (reference
mask2former_video/modeling/transformer_decoder/video_mask2former_transformer_decoder.py).

The image decoder extended with time: per-frame features are flattened into
(T*HW) token sequences, the mask head becomes einsum "bqc,bthwc->bqthw", and
— unlike the image Mask2Former decoder — the learnable query_embed positional
embedding is kept (:323).
"""

from __future__ import annotations

import math
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..models.transformer_decoder.position_encoding import position_embedding_sine
from ..models.transformer_decoder.primitives import (
    CrossAttentionLayer, FFNLayer, MLP, SelfAttentionLayer)
from ..utils import compute_dtype
from ..utils.interp import resize
from ..utils.registry import TRANSFORMER_DECODER_REGISTRY


def _temporal_pos(frame_valid, b: int, t: int, c: int, dtype) -> jax.Array:
    """(B, T, C) temporal term of the reference PositionEmbeddingSine3D
    (video position_encoding.py:35-57: z_embed = not_mask.cumsum over T,
    normalized by its last value, swept over a C-wide frequency ladder).
    Computed from frame_valid so a padded clip's REAL frames get exactly
    the unpadded clip's embeddings (normalization by the valid count, which
    is what the reference's cumsum-over-not-mask does)."""
    if frame_valid is None:
        nm = jnp.ones((b, t), jnp.float32)
    else:
        nm = jnp.broadcast_to(frame_valid, (b, t)).astype(jnp.float32)
    z = jnp.cumsum(nm, axis=1)
    z = z / (z[:, -1:] + 1e-6) * (2 * math.pi)
    dim_t_z = np.arange(c, dtype=np.float32)
    dim_t_z = 10000.0 ** (2 * (dim_t_z // 2) / c)
    pz = z[:, :, None] / dim_t_z
    pz = jnp.stack([jnp.sin(pz[:, :, 0::2]), jnp.cos(pz[:, :, 1::2])],
                   axis=3).reshape(b, t, -1)
    return pz.astype(dtype)


@TRANSFORMER_DECODER_REGISTRY.register()
class VideoMultiScaleMaskedTransformerDecoder(nn.Module):
    in_channels: int
    num_classes: int
    num_frames: int = 2
    hidden_dim: int = 256
    num_queries: int = 100
    nheads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 9
    pre_norm: bool = False
    mask_dim: int = 256
    enforce_input_project: bool = False
    mask_classification: bool = True
    num_feature_levels: int = 3
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
            dim_feedforward=cfg.MODEL.MASK_FORMER.DIM_FEEDFORWARD,
            dec_layers=cfg.MODEL.MASK_FORMER.DEC_LAYERS - 1,
            pre_norm=cfg.MODEL.MASK_FORMER.PRE_NORM,
            enforce_input_project=cfg.MODEL.MASK_FORMER.ENFORCE_INPUT_PROJ,
            mask_dim=cfg.MODEL.SEM_SEG_HEAD.MASK_DIM,
            num_frames=cfg.INPUT.SAMPLING_FRAME_NUM,
            dtype=compute_dtype(cfg),
        )

    @nn.compact
    def __call__(self, x: List[jax.Array], mask_features: jax.Array,
                 dn_args=None, *, train: bool = False, frame_valid=None):
        """x: 3 levels of (B*T, H, W, C); mask_features (B*T, H/4, W/4, C).

        frame_valid (B, T) bool: tokens of padding frames are blocked in
        every cross-attention, making the padded forward EXACTLY equal to
        the unpadded T'-frame forward at the real frames (softmax over a
        masked superset == softmax over the subset; the temporal sine PE is
        normalized by the VALID frame count, so real frames keep their
        unpadded embeddings). Only a fully-degenerate query row (every real
        token blocked) deviates: the reference's all-True reset reopens
        padding tokens too."""
        t = self.num_frames
        bt = x[0].shape[0]
        b = bt // t
        C = self.hidden_dim
        heads = self.nheads

        hm, wm = mask_features.shape[1], mask_features.shape[2]
        mask_feat = mask_features.reshape(b, t, hm, wm, -1)

        query_feat = self.param(
            "query_feat", nn.initializers.normal(1.0), (self.num_queries, C))
        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (self.num_queries, C))
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (self.num_feature_levels, C))

        decoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="decoder_norm")
        class_embed = nn.Dense(self.num_classes + 1, dtype=self.dtype, name="class_embed")
        mask_embed_mlp = MLP(C, self.mask_dim, 3, dtype=self.dtype, name="mask_embed")

        # 3D sine PE (reference PositionEmbeddingSine3D, video decoder :280):
        # spatial cat(pos_y, pos_x) per level + one temporal term shared by
        # all levels
        pos_z = _temporal_pos(frame_valid, b, t, C, self.dtype)  # (B, T, C)
        src, pos, size_list = [], [], []
        for i, xi in enumerate(x):
            h, w = xi.shape[1], xi.shape[2]
            size_list.append((h, w))
            pe = position_embedding_sine(h, w, C // 2, dtype=self.dtype)
            s = xi.astype(self.dtype)
            if self.in_channels != C or self.enforce_input_project:
                s = nn.Conv(C, (1, 1), dtype=self.dtype,
                            kernel_init=nn.initializers.xavier_uniform(),
                            name=f"input_proj_{i}")(s)
            s = s.reshape(b, t * h * w, C) + level_embed[i][None, None]
            p = pe.reshape(1, 1, h * w, C) + pos_z[:, :, None, :]
            src.append(s)
            pos.append(p.reshape(b, t * h * w, C))

        qpos = jnp.broadcast_to(query_embed[None], (b, self.num_queries, C)).astype(self.dtype)
        output = jnp.broadcast_to(query_feat[None], (b, self.num_queries, C)).astype(self.dtype)

        def heads_fn(out, size):
            dec = decoder_norm(out)
            cls = class_embed(dec)
            memb = mask_embed_mlp(dec)
            om = jnp.einsum("bqc,bthwc->bqthw", memb, mask_feat.astype(memb.dtype))
            am = resize(om, size, "bilinear")  # (B, Q, T, h, w)
            am = jax.nn.sigmoid(am).reshape(b, 1, self.num_queries, -1) < 0.5
            if frame_valid is not None:
                pad_tok = jnp.broadcast_to(
                    ~frame_valid[:, :, None], (b, t, size[0] * size[1])
                ).reshape(b, 1, 1, t * size[0] * size[1])
                am = jnp.logical_or(am, pad_tok)
            am = jnp.broadcast_to(am, (b, heads) + am.shape[2:])
            return cls, om, am

        outputs_class, outputs_mask, attn_mask = heads_fn(output, size_list[0])
        pred_cls, pred_msk = [outputs_class], [outputs_mask]

        for i in range(self.dec_layers):
            lvl = i % self.num_feature_levels
            all_blocked = jnp.all(attn_mask, axis=-1, keepdims=True)
            attn_mask = jnp.logical_and(attn_mask, ~all_blocked)
            output = CrossAttentionLayer(
                C, heads, 0.0, normalize_before=self.pre_norm, dtype=self.dtype,
                name=f"transformer_cross_attention_layers_{i}",
            )(output, src[lvl], memory_mask=attn_mask, pos=pos[lvl],
              query_pos=qpos, train=train)
            output = SelfAttentionLayer(
                C, heads, 0.0, normalize_before=self.pre_norm, dtype=self.dtype,
                name=f"transformer_self_attention_layers_{i}",
            )(output, query_pos=qpos, train=train)
            output = FFNLayer(
                C, self.dim_feedforward, 0.0, normalize_before=self.pre_norm,
                dtype=self.dtype, name=f"transformer_ffn_layers_{i}",
            )(output, train=train)
            outputs_class, outputs_mask, attn_mask = heads_fn(
                output, size_list[(i + 1) % self.num_feature_levels])
            pred_cls.append(outputs_class)
            pred_msk.append(outputs_mask)

        return {
            "pred_logits": pred_cls[-1],
            "pred_masks": pred_msk[-1],   # (B, Q, T, H/4, W/4)
            "aux_outputs": [
                {"pred_logits": a, "pred_masks": m}
                for a, m in zip(pred_cls[:-1], pred_msk[:-1])
            ],
            "dn_out": None,
        }
