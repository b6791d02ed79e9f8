"""Mask2Former transformer decoder + MP-Former MaskDN variant (TPU-native).

Rebuilds reference mask2former_transformer_decoder.py:
- `MultiScaleMaskedTransformerDecoder` (:209-555): 9 layers round-robin over 3
  scales, masked cross-attention from the previous layer's mask prediction,
  learnable query_feat only, level embeds, per-layer aux outputs.
- `MultiScaleMaskedTransformerDecoderMaskDN` (:558-1917): adds mask-piloted
  (DN) training — extra query groups carrying (optionally class-flip-noised)
  GT label embeddings whose cross-attention masks are (optionally point-flip
  noised) area-downsampled GT masks, refreshed per layer (`gen_mask_dn`
  :1584-1622), with a self-attn mask isolating groups (:1051-1059).
- `MultiScaleMaskedTransformerDecoderMaskDNLYSmooth` (:1919-3281): MaskDN +
  EMA smoothing of mask_embed across layers (r = LAST_Q_RATIO, :3226-3240).

Static-shape DN design (SURVEY.md §7.9): the reference pads DN groups to the
dynamic batch max GT count; here targets are pre-padded to a fixed cap N with
a validity mask, so `pad_size = scalar * N` is static. Invalid slots carry
zero content and fully-blocked attention rows — exactly the state the
reference's unfilled padding rows are in — and are excluded from the DN loss
by the validity mask.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...structures import DNArgs, Targets
from ...utils.interp import resize
from ...utils.registry import TRANSFORMER_DECODER_REGISTRY
from ...utils import compute_dtype
from .position_encoding import position_embedding_sine
from .primitives import CrossAttentionLayer, FFNLayer, MLP, SelfAttentionLayer


def build_transformer_decoder(cfg, in_channels, mask_classification=True):
    """Registry dispatch (reference maskformer_transformer_decoder.py:22-27)."""
    name = cfg.MODEL.MASK_FORMER.TRANSFORMER_DECODER_NAME
    return TRANSFORMER_DECODER_REGISTRY.get(name).from_config(
        cfg, in_channels, mask_classification)


def _dn_tgt_mask(scalar: int, single_pad: int, num_queries: int) -> np.ndarray:
    """(T, T) bool self-attn mask, True = blocked (reference :1051-1059)."""
    pad = scalar * single_pad
    t = pad + num_queries
    m = np.zeros((t, t), dtype=bool)
    m[pad:, :pad] = True  # match queries cannot see DN
    for g in range(scalar):
        m[g * single_pad:(g + 1) * single_pad, (g + 1) * single_pad:pad] = True
        m[g * single_pad:(g + 1) * single_pad, :g * single_pad] = True
    return m


@TRANSFORMER_DECODER_REGISTRY.register()
class MultiScaleMaskedTransformerDecoderMaskDN(nn.Module):
    in_channels: int
    num_classes: int
    hidden_dim: int = 256
    num_queries: int = 100
    nheads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 9  # reference from_config subtracts 1 from DEC_LAYERS
    pre_norm: bool = False
    mask_dim: int = 256
    enforce_input_project: bool = False
    mask_classification: bool = True
    num_feature_levels: int = 3
    # DN switches (reference :600-604, from_config :721-725)
    dn_mode: str = "points"
    head_dn: bool = False
    all_lys: bool = False
    dn_ratio: float = 0.5
    dn_label_noise_ratio: float = -1.0
    last_q_ratio: float = 0.0  # LYSmooth only
    fused_attn: bool = False   # TPU.FUSED_MASKED_ATTN -> pallas kernel
    # static GT cap for the DN block. The reference pads DN groups to the
    # batch's max GT count (~10-20 on COCO); padding to the full
    # TPU.MAX_INSTANCES cap instead runs ~80 dead queries through every
    # decoder layer. Targets are valid-prefix, so capping is a slice; GTs
    # beyond the cap still train via the matched (main) losses. 0 = no cap.
    dn_max_gt: int = 0
    dtype: jnp.dtype = jnp.float32

    # whether this class carries the label_enc embedding (MaskDN does)
    has_label_enc: bool = True

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
            dn_mode=cfg.MODEL.MASK_FORMER.DN_MODE,
            head_dn=cfg.MODEL.MASK_FORMER.HEAD_DN,
            all_lys=cfg.MODEL.MASK_FORMER.ALL_LY_DN,
            dn_ratio=cfg.MODEL.MASK_FORMER.DN_RATIO,
            dn_label_noise_ratio=cfg.MODEL.MASK_FORMER.LB_NOISE_RATIO,
            last_q_ratio=cfg.MODEL.MASK_FORMER.LAST_Q_RATIO,
            fused_attn=cfg.TPU.FUSED_MASKED_ATTN,
            dn_max_gt=cfg.TPU.DN_MAX_GT,
            dtype=compute_dtype(cfg),
        )

    # ------------------------------------------------------------------
    def _static3_blocked(self, gt_masks, targets, scalar, noise_scale,
                         size_list, B, N, pad_size):
        """Per-forward noised DN attention masks for the geometric DN modes.

        Reference prepare_for_dn_v6/v7/v8/v9 (mask2former_transformer_decoder
        .py:1063-1580): noise the GT mask once at the finest decoder level
        (size_list[-1], 1/8), nearest-downsample the noised mask to the two
        coarser levels, and keep the 3-level set fixed for the whole forward
        (`padding_mask_3level`). Returns [(B, pad_size, S_l)] blocked masks
        ordered like size_list (level 0 = 1/32). True = blocked.
        """
        h8, w8 = size_list[-1]
        fg0 = resize(gt_masks, (h8, w8), "nearest") > 0.5       # (B, N, h8, w8)
        fg = jnp.broadcast_to(fg0[:, None], (B, scalar, N, h8, w8))
        S = B * scalar * N
        fg = fg.reshape(S, h8, w8)
        boxes = jnp.broadcast_to(                # cxcywh in [0,1]
            targets.boxes[:, None], (B, scalar, N, 4)).reshape(S, 4)
        rr, cc = jnp.meshgrid(jnp.arange(h8), jnp.arange(w8), indexing="ij")

        def scatter_fg(val, dest_r, dest_c):
            # reference writes shifted fg coords into a fresh all-blocked
            # canvas with index clamping (:1113-1125) — out-of-range pixels
            # pile up on the border, which a gather can't express
            return jax.vmap(
                lambda v, r, c: jnp.zeros((h8, w8), bool).at[r, c].max(v)
            )(val, dest_r, dest_c)

        if self.dn_mode == "shift":
            # v6 (:1098-1128): shift fg by a per-instance box-sized delta.
            # Quirk kept: delta_x derives from box w, delta_y from h, and both
            # scale by the grid *width* (:1110-1111 `*= size_list[-1][-1]`)
            delta = (jax.random.uniform(self.make_rng("dn"), (S, 2)) * 2 - 1) \
                * jnp.stack([boxes[:, 2] / 2, boxes[:, 3] / 2], -1) \
                * noise_scale * w8
            dr = jnp.floor(delta[:, 0]).astype(jnp.int32)
            dc = jnp.floor(delta[:, 1]).astype(jnp.int32)
            dest_r = jnp.clip(rr[None] + dr[:, None, None], 0, h8 - 1)
            dest_c = jnp.clip(cc[None] + dc[:, None, None], 0, w8 - 1)
            blk8 = ~scatter_fg(fg, dest_r, dest_c)
        elif self.dn_mode in ("scale", "shift_scale"):
            # v7 (:1227-1266): with prob 1-dn_ratio rescale the fg by a fixed
            # (1+noise_scale) factor, recentering by box center; 'shift_scale'
            # additionally shifts like v6 (delta at :1235-1238)
            sh = int(h8 * (1 + noise_scale)) + 1
            sw = int(w8 * (1 + noise_scale)) + 1
            k_sc, k_sh = jax.random.split(self.make_rng("dn"))
            is_scale = jax.random.uniform(k_sc, (S,)) > self.dn_ratio
            # delta_center = (size - scale_size) * (cx, cy) (:1243), truncated
            # toward zero like torch .long()
            dc0 = ((h8 - sh) * boxes[:, 0]).astype(jnp.int32)
            dc1 = ((w8 - sw) * boxes[:, 1]).astype(jnp.int32)
            ii, jj = jnp.meshgrid(jnp.arange(sh), jnp.arange(sw), indexing="ij")
            src_r = jnp.minimum(ii * h8 // sh, h8 - 1)
            src_c = jnp.minimum(jj * w8 // sw, w8 - 1)
            val_scaled = fg[:, src_r, src_c]
            in_plain = (ii < h8) & (jj < w8)
            val_plain = fg[:, jnp.minimum(ii, h8 - 1), jnp.minimum(jj, w8 - 1)] \
                & in_plain[None]
            val = jnp.where(is_scale[:, None, None], val_scaled, val_plain)
            base_r = jnp.where(is_scale[:, None, None],
                               ii[None] + dc0[:, None, None], ii[None]
                               ).astype(jnp.float32)
            base_c = jnp.where(is_scale[:, None, None],
                               jj[None] + dc1[:, None, None], jj[None]
                               ).astype(jnp.float32)
            if self.dn_mode == "shift_scale":
                delta = (jax.random.uniform(k_sh, (S, 2)) * 2 - 1) \
                    * jnp.stack([boxes[:, 2] / 2, boxes[:, 3] / 2], -1) \
                    * noise_scale * w8
                base_r = base_r + delta[:, 0, None, None]
                base_c = base_c + delta[:, 1, None, None]
            dest_r = jnp.floor(jnp.clip(base_r, 0, h8 - 1)).astype(jnp.int32)
            dest_c = jnp.floor(jnp.clip(base_c, 0, w8 - 1)).astype(jnp.int32)
            blk8 = ~scatter_fg(val, dest_r, dest_c)
        elif self.dn_mode == "patch":
            # v8 (:1371-1390): carve one random rectangle of ~noise_scale x
            # fg-area unblocked (random aspect, random position)
            area = jnp.clip(fg.sum((1, 2)).astype(jnp.float32) * noise_scale,
                            1.0, None)
            k1, k2, k3, k4 = jax.random.split(self.make_rng("dn"), 4)
            max_short = jnp.floor(jnp.sqrt(area))
            short = (jnp.floor(jax.random.uniform(k1, (S,)) * max_short) + 1
                     ).astype(jnp.int32)
            long = jnp.floor(area / short).astype(jnp.int32)
            eo = jax.random.uniform(k2, (S,))
            ph = jnp.where(eo < 0.5, short, jnp.minimum(long, h8))
            pw = jnp.where(eo < 0.5, jnp.minimum(long, w8), short)
            x0 = jnp.floor(jax.random.uniform(k3, (S,)) *
                           jnp.maximum(h8 - ph + 1, 1)).astype(jnp.int32)
            y0 = jnp.floor(jax.random.uniform(k4, (S,)) *
                           jnp.maximum(w8 - pw + 1, 1)).astype(jnp.int32)
            rect = (rr[None] >= x0[:, None, None]) \
                & (rr[None] < (x0 + ph)[:, None, None]) \
                & (cc[None] >= y0[:, None, None]) \
                & (cc[None] < (y0 + pw)[:, None, None])
            blk8 = ~fg & ~rect
        else:  # points_MAE
            # v9 (:1489-1518): blocked |= bernoulli(noise_scale), drawn
            # independently per level on the *un-noised* downsample chain
            blk8 = ~fg
            levels = []
            chain = blk8
            for (h, w) in reversed(size_list):  # finest -> coarsest
                if (h, w) != (h8, w8):
                    chain = resize(chain.astype(jnp.float32), (h, w),
                                   "nearest") > 0.5
                noise = jax.random.uniform(
                    self.make_rng("dn"), chain.shape) < noise_scale
                levels.append(chain | noise)
            levels = list(reversed(levels))  # back to size_list order
            return self._static3_pack(levels, targets, size_list, B, scalar,
                                      N, pad_size)

        # nearest-downsample the noised 1/8 mask to the coarser levels
        # (v6 :1130-1137: both coarser levels resize from new_masks)
        levels = []
        for (h, w) in size_list:
            m = blk8 if (h, w) == (h8, w8) else (
                resize(blk8.astype(jnp.float32), (h, w), "nearest") > 0.5)
            levels.append(m)
        return self._static3_pack(levels, targets, size_list, B, scalar, N,
                                  pad_size)

    def _static3_pack(self, levels, targets, size_list, B, scalar, N,
                      pad_size):
        """(S, h, w) per level -> (B, pad_size, h*w), invalid slots blocked."""
        out = []
        for m, (h, w) in zip(levels, size_list):
            m = m.reshape(B, scalar, N, h * w)
            m = jnp.where(targets.valid[:, None, :, None], m, True)
            out.append(m.reshape(B, pad_size, h * w))
        return out

    # ------------------------------------------------------------------
    @nn.compact
    def __call__(
        self,
        x: List[jax.Array],               # 3 NHWC multi-scale features
        mask_features: jax.Array,         # (B, H/4, W/4, mask_dim)
        dn_args: Optional[DNArgs] = None,
        *,
        train: bool = False,
    ):
        assert len(x) == self.num_feature_levels
        B = x[0].shape[0]
        C = self.hidden_dim
        heads = self.nheads

        # ---- learnable tables -----------------------------------------
        query_feat = self.param(
            "query_feat", nn.initializers.normal(1.0), (self.num_queries, C))
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (self.num_feature_levels, C))
        if self.has_label_enc:
            label_enc = self.param(
                "label_enc", nn.initializers.normal(1.0), (self.num_classes, C))

        # ---- shared submodules (called repeatedly, params shared) -----
        decoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="decoder_norm")
        class_embed = nn.Dense(self.num_classes + 1, dtype=self.dtype, name="class_embed")
        mask_embed_mlp = MLP(C, self.mask_dim, 3, dtype=self.dtype, name="mask_embed")
        cross_layers = [
            CrossAttentionLayer(C, heads, 0.0, normalize_before=self.pre_norm,
                                fused_attn=self.fused_attn, dtype=self.dtype,
                                name=f"transformer_cross_attention_layers_{i}")
            for i in range(self.dec_layers)
        ]
        self_layers = [
            SelfAttentionLayer(C, heads, 0.0, normalize_before=self.pre_norm,
                               dtype=self.dtype, name=f"transformer_self_attention_layers_{i}")
            for i in range(self.dec_layers)
        ]
        ffn_layers = [
            FFNLayer(C, self.dim_feedforward, 0.0, normalize_before=self.pre_norm,
                     dtype=self.dtype, name=f"transformer_ffn_layers_{i}")
            for i in range(self.dec_layers)
        ]

        # ---- flatten sources + PE + level embed (reference :1716-1723) -
        src, pos, size_list = [], [], []
        for i, xi in enumerate(x):
            h, w = xi.shape[1], xi.shape[2]
            size_list.append((h, w))
            pe = position_embedding_sine(h, w, C // 2, dtype=self.dtype)
            pos.append(jnp.broadcast_to(
                pe.reshape(1, h * w, C), (B, h * w, C)))
            s = xi.astype(self.dtype)
            if self.in_channels != C or self.enforce_input_project:
                s = nn.Conv(C, (1, 1), dtype=self.dtype,
                            kernel_init=nn.initializers.xavier_uniform(),
                            name=f"input_proj_{i}")(s)
            src.append(s.reshape(B, h * w, C) + level_embed[i][None, None])

        # ---- prediction heads closure (reference :1859-1877) ----------
        last_memb = [None]  # LYSmooth state across layers

        def forward_prediction_heads(output, attn_mask_target_size):
            dec = decoder_norm(output)
            outputs_class = class_embed(dec)
            memb = mask_embed_mlp(dec)
            if self.last_q_ratio > 0.0 and last_memb[0] is not None:
                # LYSmooth EMA (reference :3226-3228)
                memb = self.last_q_ratio * last_memb[0] + (1.0 - self.last_q_ratio) * memb
            if self.last_q_ratio > 0.0:
                last_memb[0] = jax.lax.stop_gradient(memb)  # reference :3240
            outputs_mask = jnp.einsum(
                "bqc,bhwc->bqhw", memb, mask_features.astype(memb.dtype))
            am = resize(outputs_mask, attn_mask_target_size, "bilinear")
            am = jax.nn.sigmoid(am).reshape(B, 1, outputs_mask.shape[1], -1) < 0.5
            am = jnp.broadcast_to(am, (B, heads) + am.shape[2:])
            return outputs_class, outputs_mask, am

        # ---- DN preparation. Reference dispatch (:1728-1750):
        # 'points'→v5 :968 (live, the released recipe), 'shift'→v6 :1063,
        # 'scale'/'shift_scale'→v7 :1200, 'patch'→v8 :1336, 'points_MAE'→v9
        # :1462 (all live: they return the 8-tuple forward expects).
        # 'base'/'lb'/'mask' (v1/v2/v3 :1624/:737/:809) are dead upstream —
        # they return 7-tuples while forward unpacks 8 (:1757-1759) — so ours
        # are reconstructed *working* versions: same group layout and GT
        # attention masks, mode-specific content noise, no per-layer refresh.
        _STATIC3_MODES = ("shift", "scale", "shift_scale", "patch", "points_MAE")
        use_dn = dn_args is not None and self.has_label_enc \
            and self.dn_mode in ("points", "lb", "mask", "base") + _STATIC3_MODES
        tgt_mask = None
        dn_meta = None
        if use_dn:
            targets = dn_args.targets
            cap = targets.num_instances
            if self.dn_max_gt > 0:
                cap = min(cap, self.dn_max_gt)
            if dn_args.batch_max is not None:
                # NUM_DN >= 100 budget convention: the reference pads to the
                # BATCH max GT (:973-974), so the DN block is
                # groups * batch_max ~ the budget — not groups * static-cap
                # (which inflates the block by cap/batch_max)
                cap = min(cap, max(1, dn_args.batch_max))
            if cap < targets.num_instances:
                # compact the DN block to the cap (targets are valid-prefix,
                # so this is a slice; see dn_max_gt docstring)
                targets = Targets(
                    labels=targets.labels[:, :cap],
                    masks=targets.masks[:, :cap],
                    boxes=targets.boxes[:, :cap],
                    valid=targets.valid[:, :cap])
            N = targets.num_instances
            scalar = dn_args.scalar
            if scalar >= 100:
                # NUM_DN >= 100 is a total-query budget: the reference
                # divides by the BATCH max GT count (:973-974). That value is
                # host-side under jit; the trainer passes it via
                # dn_args.groups (compute_dn_groups). Fallback: the static
                # instance cap (upper-bounds the batch max).
                scalar = dn_args.groups if dn_args.groups is not None \
                    else max(1, scalar // N)
            pad_size = scalar * N
            noise_scale = dn_args.noise_scale

            # pre-compute downsampled blocked masks per level: area (<=1e-8)
            # for points/mask/base (:986), nearest (<0.5) for lb (:763)
            gt_masks = targets.masks.astype(jnp.float32)  # (B, N, H, W)
            ds_method = "nearest" if self.dn_mode == "lb" else "area"
            blocked_lvl = []
            for (h, w) in size_list:
                ds = resize(gt_masks, (h, w), ds_method).reshape(B, N, h * w)
                blk = (ds < 0.5) if self.dn_mode == "lb" else (ds <= 1e-8)
                blk = jnp.where(targets.valid[:, :, None], blk, True)
                blocked_lvl.append(blk)

            static3_lvl = None
            if self.dn_mode in _STATIC3_MODES:
                static3_lvl = self._static3_blocked(
                    gt_masks, targets, scalar, noise_scale, size_list, B, N,
                    pad_size)

            mask_noise = noise_scale if self.dn_mode in ("points", "mask") else 0.0

            def dn_padding_mask(level: int) -> jax.Array:
                """(B, heads, pad_size, S_l) blocked mask with fresh point noise
                (reference gen_mask_dn :1584-1622)."""
                if static3_lvl is not None:
                    # shift/scale/shift_scale/patch/points_MAE: the noised
                    # masks are fixed per forward (reference
                    # padding_mask_3level, used via forward_prediction_heads_dn
                    # :1817-1819); repeat over heads (:1178 `.repeat([1,8,1,1])`)
                    m = static3_lvl[level]  # (B, pad_size, S_l)
                    return jnp.broadcast_to(m[:, None], (B, heads) + m.shape[1:])
                noise_scale = mask_noise
                h, w = size_list[level]
                s = h * w
                blk = blocked_lvl[level]  # (B, N, S)
                if self.head_dn:
                    m = jnp.broadcast_to(
                        blk[:, None, :, :], (B, scalar * heads, N, s)
                    ).reshape(B, scalar, heads, N, s)
                    if noise_scale > 0:
                        areas = jnp.sum(~m, axis=-1)  # (B, scalar, heads, N)
                        ratio = areas.astype(jnp.float32) * noise_scale / s
                        delta = jax.random.uniform(
                            self.make_rng("dn"), m.shape) < ratio[..., None]
                        m = jnp.logical_xor(m, delta)
                        m = jnp.where(targets.valid[:, None, None, :, None], m, True)
                    # (B, scalar, heads, N, S) -> (B, heads, scalar*N, S)
                    m = jnp.moveaxis(m, 2, 1).reshape(B, heads, pad_size, s)
                    return m
                m = jnp.broadcast_to(blk[:, None], (B, scalar, N, s))
                if noise_scale > 0:
                    areas = jnp.sum(~m, axis=-1)
                    ratio = areas.astype(jnp.float32) * noise_scale / s
                    delta = jax.random.uniform(
                        self.make_rng("dn"), m.shape) < ratio[..., None]
                    m = jnp.logical_xor(m, delta)
                    m = jnp.where(targets.valid[:, None, :, None], m, True)
                m = m.reshape(B, pad_size, s)
                return jnp.broadcast_to(m[:, None], (B, heads, pad_size, s))

            # content per mode
            labels = jnp.broadcast_to(
                targets.labels[:, None, :], (B, scalar, N))
            if self.dn_mode in ("points",) + _STATIC3_MODES \
                    and self.dn_label_noise_ratio > 0:
                # class-flip noise (reference :1004-1018; v6-v9 apply the
                # same block, e.g. :1143-1152)
                kf, kl = jax.random.split(self.make_rng("dn"))
                flip = jax.random.uniform(kf, labels.shape) < self.dn_label_noise_ratio
                rand_lb = jax.random.randint(kl, labels.shape, 0, self.num_classes)
                labels = jnp.where(flip, rand_lb, labels)
            labels = jnp.clip(labels, 0, self.num_classes - 1)
            if self.dn_mode == "base":
                # mask-averaged feature content with multiplicative noise
                # (reference :1643-1650 / vanilla :373-380)
                mf = mask_features.astype(jnp.float32)
                m = resize(gt_masks, mf.shape[1:3], "bilinear")  # (B,N,h,w)
                num = jnp.einsum("bnhw,bhwc->bnc", m, mf)
                den = m.sum(axis=(2, 3))[..., None] + 1e-8
                feats = jax.lax.stop_gradient(num / den)  # (B, N, C)
                content = jnp.broadcast_to(feats[:, None], (B, scalar, N, C))
                if noise_scale > 0:
                    u = jax.random.uniform(self.make_rng("dn"), content.shape)
                    content = content + (u * 2 - 1) * noise_scale * content
            else:
                content = jnp.asarray(label_enc)[labels]  # (B, scalar, N, C)
                if (self.dn_mode == "lb" or
                        (self.dn_mode == "shift"
                         and self.dn_label_noise_ratio <= 0)) and noise_scale > 0:
                    # multiplicative embedding noise (reference :774-775;
                    # 'shift' applies it only when label noise is off :1158-1162)
                    u = jax.random.uniform(self.make_rng("dn"), content.shape)
                    content = content + (u * 2 - 1) * noise_scale * content
            content = jnp.where(
                targets.valid[:, None, :, None], content, 0.0
            ).reshape(B, pad_size, C).astype(self.dtype)

            output = jnp.concatenate(
                [content,
                 jnp.broadcast_to(query_feat[None], (B, self.num_queries, C)).astype(self.dtype)],
                axis=1)
            tgt_mask = jnp.asarray(_dn_tgt_mask(scalar, N, self.num_queries))
            dn_meta = {"max_num": N, "pad_size": pad_size, "scalar": scalar}

            outputs_class, outputs_mask, attn_mask = forward_prediction_heads(
                output, size_list[0])
            attn_mask = attn_mask.at[:, :, :pad_size].set(dn_padding_mask(0))
        else:
            output = jnp.broadcast_to(
                query_feat[None], (B, self.num_queries, C)).astype(self.dtype)
            outputs_class, outputs_mask, attn_mask = forward_prediction_heads(
                output, size_list[0])

        predictions_class = [outputs_class]
        predictions_mask = [outputs_mask]

        # ---- decoder layers (reference :1779-1826) ---------------------
        for i in range(self.dec_layers):
            level_index = i % self.num_feature_levels
            # degenerate all-blocked rows attend everywhere (reference :1780)
            all_blocked = jnp.all(attn_mask, axis=-1, keepdims=True)
            attn_mask = jnp.logical_and(attn_mask, ~all_blocked)

            output = cross_layers[i](
                output, src[level_index], memory_mask=attn_mask,
                pos=pos[level_index], query_pos=None, train=train)
            output = self_layers[i](output, tgt_mask=tgt_mask, train=train)
            output = ffn_layers[i](output, train=train)

            level = (i + 1) % self.num_feature_levels
            # per-layer DN mask refresh: 'points' mode only (reference
            # :1805-1816; other modes' refresh path is the dead branch)
            refresh = use_dn and (self.all_lys or i < 3) and \
                self.dn_mode in ("points",) + _STATIC3_MODES
            outputs_class, outputs_mask, attn_mask = forward_prediction_heads(
                output, size_list[level])
            if refresh:
                attn_mask = attn_mask.at[:, :, :pad_size].set(dn_padding_mask(level))
            predictions_class.append(outputs_class)
            predictions_mask.append(outputs_mask)

        assert len(predictions_class) == self.dec_layers + 1

        # ---- assemble outputs (reference :1831-1856) -------------------
        if use_dn:
            dn_cls = [p[:, :pad_size] for p in predictions_class]
            dn_msk = [p[:, :pad_size] for p in predictions_mask]
            predictions_class = [p[:, pad_size:] for p in predictions_class]
            predictions_mask = [p[:, pad_size:] for p in predictions_mask]
            dn_out = {
                "pred_logits": dn_cls[-1],
                "pred_masks": dn_msk[-1],
                "aux_outputs": [
                    {"pred_logits": a, "pred_masks": b}
                    for a, b in zip(dn_cls[:-1], dn_msk[:-1])
                ],
                "dn_args": dn_meta,
            }
        else:
            dn_out = None

        return {
            "pred_logits": predictions_class[-1],
            "pred_masks": predictions_mask[-1],
            "aux_outputs": [
                {"pred_logits": a, "pred_masks": b}
                for a, b in zip(predictions_class[:-1], predictions_mask[:-1])
            ],
            "dn_out": dn_out,
        }


@TRANSFORMER_DECODER_REGISTRY.register()
class MultiScaleMaskedTransformerDecoder(MultiScaleMaskedTransformerDecoderMaskDN):
    """Vanilla Mask2Former decoder (reference :209-555) — no DN machinery."""

    has_label_enc: bool = False
    dn_mode: str = "none"

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
            dtype=compute_dtype(cfg),
        )


@TRANSFORMER_DECODER_REGISTRY.register()
class MultiScaleMaskedTransformerDecoderMaskDNLYSmooth(
        MultiScaleMaskedTransformerDecoderMaskDN):
    """MaskDN + cross-layer EMA smoothing of mask_embed (reference :1919-3281,
    smoothing at :3226-3240, r = MODEL.MASK_FORMER.LAST_Q_RATIO)."""
    pass
