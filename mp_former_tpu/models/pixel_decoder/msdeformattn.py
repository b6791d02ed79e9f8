"""MSDeformAttn pixel decoder (reference pixel_decoder/msdeformattn.py:23-358).

Deformable-DETR encoder over the res3-5 features (6 layers by default) plus
one FPN step down to res2; emits (mask_features @1/4, transformer feature
@1/32, [1/32, 1/16, 1/8] multi-scale features).

TPU notes: static shapes mean no padding masks — valid_ratios are all-ones,
so reference points collapse to a precomputed constant grid (reference
get_reference_points :140-153 with valid_ratios==1). The reference pins this
module to fp32 (`@autocast(enabled=False)`, :314); we default to fp32 compute
with an optional bfloat16 switch for benchmarking.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.ms_deform_attn import MSDeformAttn
from ...parallel.mesh import constrain_replicated, maybe_constrain
from ...utils.interp import resize_nhwc
from ...utils.registry import PIXEL_DECODER_REGISTRY
from ...utils.shape_spec import ShapeSpec
from ...utils import compute_dtype
from ..transformer_decoder.position_encoding import position_embedding_sine


def _reference_points(spatial_shapes: Sequence[Tuple[int, int]]) -> np.ndarray:
    """(S, L, 2) normalized center-grid reference points (valid_ratios == 1)."""
    pts = []
    for h, w in spatial_shapes:
        ry = (np.arange(h, dtype=np.float32) + 0.5) / h
        rx = (np.arange(w, dtype=np.float32) + 0.5) / w
        gy, gx = np.meshgrid(ry, rx, indexing="ij")
        pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    ref = np.concatenate(pts, axis=0)  # (S, 2)
    return np.tile(ref[:, None, :], (1, len(spatial_shapes), 1))


class MSDeformAttnTransformerEncoderLayer(nn.Module):
    d_model: int = 256
    d_ffn: int = 1024
    dropout: float = 0.1
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4
    spatial_shapes: Tuple[Tuple[int, int], ...] = ()
    train_mode: bool = False  # static (baked at construction for nn.remat)
    sampling_engine: str = "packed2x2"  # TPU.SAMPLING_ENGINE
    pallas_weighting: bool = False      # TPU.PALLAS_TAP_WEIGHTING
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos, reference_points):
        spatial_shapes = self.spatial_shapes
        drop = nn.Dropout(self.dropout, deterministic=not self.train_mode)
        src2 = MSDeformAttn(
            d_model=self.d_model, n_levels=self.n_levels, n_heads=self.n_heads,
            n_points=self.n_points, sampling_engine=self.sampling_engine,
            pallas_weighting=self.pallas_weighting,
            dtype=self.dtype, name="self_attn",
        )(src + pos, reference_points, src, spatial_shapes)
        src = src + drop(src2)
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src)
        # ffn
        h = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(src)
        h = drop(nn.relu(h))
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)
        src = src + drop(h)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(src)


class _ScannedEncoderLayer(nn.Module):
    """lax.scan body: one encoder layer returning (carry, None). Scanned
    with stacked params (leading axis = layer) under TPU.SCAN_ENCODER."""

    d_model: int
    d_ffn: int
    dropout: float
    n_levels: int
    n_heads: int
    n_points: int
    spatial_shapes: Tuple[Tuple[int, int], ...]
    train_mode: bool
    sampling_engine: str
    pallas_weighting: bool
    remat: bool
    remat_policy: str
    dtype: jnp.dtype
    shard_tokens: bool = False

    @nn.compact
    def __call__(self, src, pos, reference_points):
        policy = (jax.checkpoint_policies.dots_saveable
                  if self.remat_policy == "dots" else None)
        layer_cls = (nn.remat(MSDeformAttnTransformerEncoderLayer,
                              policy=policy, prevent_cse=False)
                     if self.remat else MSDeformAttnTransformerEncoderLayer)
        out = layer_cls(
            d_model=self.d_model, d_ffn=self.d_ffn, dropout=self.dropout,
            n_levels=self.n_levels, n_heads=self.n_heads,
            n_points=self.n_points, spatial_shapes=self.spatial_shapes,
            train_mode=self.train_mode, sampling_engine=self.sampling_engine,
            pallas_weighting=self.pallas_weighting,
            dtype=self.dtype, name="layer",
        )(src, pos, reference_points)
        if self.shard_tokens:
            out = maybe_constrain(out, None, "data", None)
        return out, None


class MSDeformAttnTransformerEncoderOnly(nn.Module):
    """Reference MSDeformAttnTransformerEncoderOnly (:23-89)."""

    d_model: int = 256
    nhead: int = 8
    num_encoder_layers: int = 6
    dim_feedforward: int = 1024
    dropout: float = 0.1
    num_feature_levels: int = 3
    enc_n_points: int = 4
    remat: bool = True
    remat_policy: str = "full"  # TPU.REMAT_POLICY: 'full' | 'dots'
    sampling_engine: str = "packed2x2"
    pallas_weighting: bool = False
    scan_layers: bool = False  # TPU.SCAN_ENCODER
    shard_tokens: bool = False  # TPU.SHARD_TOKENS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, srcs: List[jax.Array], pos_embeds: List[jax.Array],
                 *, train: bool = False):
        """srcs/pos_embeds: per-level NHWC (B, H_l, W_l, C). Returns
        (memory (B, S, C), spatial_shapes)."""
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (self.num_feature_levels, self.d_model))
        spatial_shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)
        src_flat = jnp.concatenate(
            [s.reshape(s.shape[0], -1, self.d_model) for s in srcs], axis=1)
        pos_flat = jnp.concatenate(
            [
                (p.reshape(p.shape[0], -1, self.d_model) + level_embed[i][None, None])
                for i, p in enumerate(pos_embeds)
            ],
            axis=1,
        )
        ref = jnp.asarray(_reference_points(spatial_shapes))[None]  # (1, S, L, 2)
        ref = jnp.broadcast_to(ref, (src_flat.shape[0],) + ref.shape[1:])

        if self.shard_tokens:
            # SPMD over the TOKEN axis (TPU.SHARD_TOKENS): the deformable
            # sampling is gather-ROW-bound (~7.5 ns/row, PERFORMANCE.md) and
            # rows scale with tokens, so sharding S over the mesh's `data`
            # axis divides the per-chip gather floor by the axis size. The
            # per-token tensors (offsets, locations, weights, gather indices)
            # inherit the layout; GSPMD all-gathers the ~11 MB bf16 value
            # table per layer where spatial structure is rebuilt — ICI-cheap
            # next to the row savings. This is the multi-chip path that makes
            # the REFERENCE-EXACT engine fast (per-chip sampling semantics
            # are unchanged; single-device meshes make this a no-op).
            src_flat = maybe_constrain(src_flat, None, "data", None)
            pos_flat = maybe_constrain(pos_flat, None, "data", None)
            ref = maybe_constrain(ref, None, "data", None, None)

        if self.scan_layers:
            # one lax.scan over stacked layer params: identical math to the
            # unrolled loop (tests/test_pixel_decoder.py scan-parity), ~6x
            # fewer HLOs dispatched per forward
            scan_cls = nn.scan(
                _ScannedEncoderLayer,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=self.num_encoder_layers,
            )
            out, _ = scan_cls(
                d_model=self.d_model, d_ffn=self.dim_feedforward,
                dropout=self.dropout, n_levels=self.num_feature_levels,
                n_heads=self.nhead, n_points=self.enc_n_points,
                spatial_shapes=spatial_shapes, train_mode=train,
                sampling_engine=self.sampling_engine,
                pallas_weighting=self.pallas_weighting,
                remat=self.remat, remat_policy=self.remat_policy,
                dtype=self.dtype, shard_tokens=self.shard_tokens,
                name="encoder_scan",
            )(src_flat.astype(self.dtype), pos_flat, ref)
            # (carry must be dtype-stable across scan iterations: the input
            # projections' GroupNorm promotes to f32 while layers emit
            # self.dtype)
            return out, spatial_shapes

        # rematerialize each encoder layer under autodiff: the deformable
        # gather/taps intermediates otherwise dominate activation memory
        # (OOM at bs8/512px on a 16GB chip)
        policy = (jax.checkpoint_policies.dots_saveable
                  if self.remat_policy == "dots" else None)
        layer_cls = (nn.remat(MSDeformAttnTransformerEncoderLayer,
                              static_argnums=(), policy=policy)
                     if self.remat else MSDeformAttnTransformerEncoderLayer)
        out = src_flat
        for i in range(self.num_encoder_layers):
            out = layer_cls(
                d_model=self.d_model, d_ffn=self.dim_feedforward,
                dropout=self.dropout, n_levels=self.num_feature_levels,
                n_heads=self.nhead, n_points=self.enc_n_points,
                spatial_shapes=spatial_shapes, train_mode=train,
                sampling_engine=self.sampling_engine,
                pallas_weighting=self.pallas_weighting,
                dtype=self.dtype, name=f"encoder_layers_{i}",
            )(out, pos_flat, ref)
            if self.shard_tokens:
                out = maybe_constrain(out, None, "data", None)
        return out, spatial_shapes


@PIXEL_DECODER_REGISTRY.register()
class MSDeformAttnPixelDecoder(nn.Module):
    """Reference MSDeformAttnPixelDecoder (:164-358). NHWC features in/out."""

    input_shape: Dict[str, ShapeSpec]
    transformer_dropout: float = 0.0
    transformer_nheads: int = 8
    transformer_dim_feedforward: int = 1024  # hard-coded in reference from_config :306
    transformer_enc_layers: int = 6
    conv_dim: int = 256
    mask_dim: int = 256
    norm: str = "GN"
    transformer_in_features: Sequence[str] = ("res3", "res4", "res5")
    common_stride: int = 4
    maskformer_num_feature_levels: int = 3
    remat: bool = True  # TPU.REMAT_ENCODER
    remat_policy: str = "full"  # TPU.REMAT_POLICY
    sampling_engine: str = "packed2x2"  # TPU.SAMPLING_ENGINE
    pallas_weighting: bool = False      # TPU.PALLAS_TAP_WEIGHTING
    scan_layers: bool = False           # TPU.SCAN_ENCODER
    shard_tokens: bool = False          # TPU.SHARD_TOKENS
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_config(cls, cfg, input_shape: Dict[str, ShapeSpec]):
        return cls(
            input_shape={k: v for k, v in input_shape.items()
                         if k in cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES},
            conv_dim=cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM,
            mask_dim=cfg.MODEL.SEM_SEG_HEAD.MASK_DIM,
            norm=cfg.MODEL.SEM_SEG_HEAD.NORM,
            transformer_dropout=cfg.MODEL.MASK_FORMER.DROPOUT,
            transformer_nheads=cfg.MODEL.MASK_FORMER.NHEADS,
            transformer_dim_feedforward=1024,
            transformer_enc_layers=cfg.MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS,
            transformer_in_features=tuple(
                cfg.MODEL.SEM_SEG_HEAD.DEFORMABLE_TRANSFORMER_ENCODER_IN_FEATURES),
            common_stride=cfg.MODEL.SEM_SEG_HEAD.COMMON_STRIDE,
            remat=cfg.TPU.REMAT_ENCODER,
            remat_policy=cfg.TPU.REMAT_POLICY,
            sampling_engine=cfg.TPU.SAMPLING_ENGINE,
            pallas_weighting=cfg.TPU.PALLAS_TAP_WEIGHTING,
            scan_layers=cfg.TPU.SCAN_ENCODER,
            shard_tokens=bool(getattr(cfg.TPU, "SHARD_TOKENS", False)),
            dtype=compute_dtype(cfg),
        )

    @nn.compact
    def __call__(self, features: Dict[str, jax.Array], *, train: bool = False):
        """features: name -> (B, H, W, C). Returns (mask_features,
        transformer_encoder_feature, multi_scale_features[3])."""
        in_features = sorted(
            [k for k in self.input_shape], key=lambda k: self.input_shape[k].stride)
        tx_features = sorted(
            [k for k in self.transformer_in_features],
            key=lambda k: self.input_shape[k].stride)
        num_fpn_levels = int(
            math.log2(min(self.input_shape[k].stride for k in tx_features))
            - math.log2(self.common_stride))

        # input projections, low-res -> high-res (res5 -> res3), reference :319-322
        srcs, pos = [], []
        for idx, f in enumerate(tx_features[::-1]):
            x = features[f].astype(self.dtype)
            y = nn.Conv(self.conv_dim, (1, 1),
                        kernel_init=nn.initializers.xavier_uniform(),
                        name=f"input_proj_{idx}_conv")(x)
            y = nn.GroupNorm(num_groups=32, epsilon=1e-5, name=f"input_proj_{idx}_gn")(y)
            if self.shard_tokens:
                # pin the NHWC producer replicated: the token-sharded encoder
                # flatten otherwise back-propagates a conflicting H-tiling into
                # this GN and GSPMD resolves it with an involuntary full
                # rematerialization (MULTICHIP_r04 warning); the explicit pin
                # turns the reshard into a cheap slice at the constraint
                y = constrain_replicated(y)
            srcs.append(y)
            pe = position_embedding_sine(
                x.shape[1], x.shape[2], self.conv_dim // 2, dtype=self.dtype)
            pos.append(jnp.broadcast_to(pe[None], (x.shape[0],) + pe.shape))

        memory, spatial_shapes = MSDeformAttnTransformerEncoderOnly(
            d_model=self.conv_dim, dropout=self.transformer_dropout,
            nhead=self.transformer_nheads,
            dim_feedforward=self.transformer_dim_feedforward,
            num_encoder_layers=self.transformer_enc_layers,
            num_feature_levels=len(tx_features),
            remat=self.remat,
            remat_policy=self.remat_policy,
            sampling_engine=self.sampling_engine,
            pallas_weighting=self.pallas_weighting,
            scan_layers=self.scan_layers,
            shard_tokens=self.shard_tokens,
            dtype=self.dtype, name="transformer",
        )(srcs, pos, train=train)

        # split back into per-level maps (B, H, W, C)
        if self.shard_tokens:
            # one explicit all-gather of the final memory: the FPN and the
            # decoder consume full spatial maps, and pinning here keeps GSPMD
            # from chasing the token sharding through the per-level reshapes
            memory = constrain_replicated(memory)
        out: List[jax.Array] = []
        start = 0
        for (h, w) in spatial_shapes:
            out.append(memory[:, start:start + h * w].reshape(-1, h, w, self.conv_dim))
            start += h * w

        # extra FPN levels down to common_stride (reference :343-351)
        use_bias = self.norm == ""
        for idx, f in enumerate(in_features[:num_fpn_levels][::-1]):
            x = features[f].astype(self.dtype)
            lateral = nn.Conv(self.conv_dim, (1, 1), use_bias=use_bias,
                              kernel_init=nn.initializers.xavier_uniform(),
                              name=f"adapter_{idx + 1}_conv")(x)
            if not use_bias:
                lateral = nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                       name=f"adapter_{idx + 1}_gn")(lateral)
            y = lateral + resize_nhwc(out[-1], (x.shape[1], x.shape[2]), "bilinear")
            y = nn.Conv(self.conv_dim, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=use_bias,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name=f"layer_{idx + 1}_conv")(y)
            if not use_bias:
                y = nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                 name=f"layer_{idx + 1}_gn")(y)
            y = nn.relu(y)
            out.append(y)

        mask_features = nn.Conv(self.mask_dim, (1, 1),
                                kernel_init=nn.initializers.xavier_uniform(),
                                name="mask_features")(out[-1])
        multi_scale = out[: self.maskformer_num_feature_levels]
        return mask_features, out[0], multi_scale
