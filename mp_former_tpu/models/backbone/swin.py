"""Swin Transformer backbone (reference modeling/backbone/swin.py:1-770).

NHWC, static shapes: window padding, shift masks, and relative-position
indices are computed at trace time with numpy. The qkv projection stays
packed as one Dense (torch layout) so checkpoints convert 1:1.
`D2SwinTransformer`'s role (res2-5 ShapeSpec dict, per-stage output norms,
`size_divisibility=32`) is folded into `SwinTransformer` + `output_shape()`.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...utils.registry import BACKBONE_REGISTRY
from ...utils.shape_spec import ShapeSpec
from ...utils import compute_dtype

_trunc02 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


def _relative_position_index(wh: int, ww: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)  # (wh*ww, wh*ww)


def _shift_attn_mask(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """(nW, ws*ws, ws*ws) additive mask (0 / -100) for shifted windows."""
    img = np.zeros((hp, wp))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    win = img.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """(B, H, W, C) -> (B*nW, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(windows: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    c = windows.shape[-1]
    b = windows.shape[0] // (h * w // ws // ws)
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


class WindowAttention(nn.Module):
    dim: int
    window_size: Tuple[int, int]
    num_heads: int
    qkv_bias: bool = True
    qk_scale: float | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None = None) -> jax.Array:
        b_, n, c = x.shape
        h = self.num_heads
        d = c // h
        scale = self.qk_scale or d ** -0.5

        table = self.param(
            "relative_position_bias_table", _trunc02,
            ((2 * self.window_size[0] - 1) * (2 * self.window_size[1] - 1), h))
        idx = _relative_position_index(*self.window_size)

        qkv = nn.Dense(c * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, h, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)
        bias = table[idx.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, h, n, n) + mask[None, :, None]
            attn = attn.reshape(b_, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    block_hw: Tuple[int, int] = (0, 0)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    drop_path: float = 0.0
    train_mode: bool = False  # baked statically (nn.remat-compatible)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h, w, train = self.block_hw[0], self.block_hw[1], self.train_mode
        b, l, c = x.shape
        ws = self.window_size
        shift = self.shift_size
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x.reshape(b, h, w, c)

        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            attn_mask = jnp.asarray(_shift_attn_mask(hp, wp, ws, shift), self.dtype)
        else:
            attn_mask = None

        windows = window_partition(x, ws)
        attn_out = WindowAttention(
            self.dim, (ws, ws), self.num_heads, self.qkv_bias, self.qk_scale,
            dtype=self.dtype, name="attn")(windows, attn_mask)
        x = window_reverse(attn_out, ws, hp, wp)

        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :h, :w]
        x = x.reshape(b, h * w, c)

        def drop_path(y):
            if self.drop_path == 0.0 or not train:
                return y
            keep = 1.0 - self.drop_path
            mask = jax.random.bernoulli(
                self.make_rng("dropout"), keep, (y.shape[0], 1, 1))
            return y * mask / keep

        x = shortcut + drop_path(x)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + drop_path(y)


class PatchMerging(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, h: int, w: int) -> jax.Array:
        b, l, c = x.shape
        x = x.reshape(b, h, w, c)
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], -1).reshape(b, -1, 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype, name="reduction")(x)


class SwinTransformer(nn.Module):
    """Reference SwinTransformer (:498-683) + D2 wrapper (:686-770)."""

    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    drop_path_rate: float = 0.3
    patch_norm: bool = True
    ape: bool = False
    pretrain_img_size: int = 224  # APE param grid = pretrain/patch (d2 :567)
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    frozen_stages: int = -1
    use_checkpoint: bool = False  # reference SWIN.USE_CHECKPOINT -> nn.remat
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> Dict[str, jax.Array]:
        """x: (B, H, W, 3) -> dict res2..res5 NHWC."""
        num_layers = len(self.depths)
        out_indices = sorted(int(f[3:]) - 2 for f in self.out_features)

        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), padding="VALID",
                    dtype=self.dtype, name="patch_embed_proj")(x)
        b, wh, ww, c = x.shape
        x = x.reshape(b, wh * ww, c)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_embed_norm")(x)
        if self.ape:
            # absolute position embedding on the pretrain patch grid,
            # bicubic-resized to the actual grid (reference swin.py:567-661)
            g = self.pretrain_img_size // self.patch_size
            ape = self.param(
                "absolute_pos_embed",
                nn.initializers.truncated_normal(0.02), (1, g, g, c))
            ape = jax.image.resize(
                ape, (1, wh, ww, c), method="cubic").astype(x.dtype)
            x = x + ape.reshape(1, wh * ww, c)

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        outs: Dict[str, jax.Array] = {}
        h, w = wh, ww
        dim = self.embed_dim
        blk_idx = 0
        for i in range(num_layers):
            block_cls = (nn.remat(SwinBlock, static_argnums=())
                         if self.use_checkpoint else SwinBlock)
            for j in range(self.depths[i]):
                shift = 0 if j % 2 == 0 else self.window_size // 2
                x = block_cls(
                    dim=dim, num_heads=self.num_heads[i],
                    window_size=self.window_size, shift_size=shift,
                    block_hw=(h, w), train_mode=train,
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    qk_scale=self.qk_scale, drop_path=float(dpr[blk_idx]),
                    dtype=self.dtype, name=f"layers_{i}_blocks_{j}",
                )(x)
                blk_idx += 1
            if i in out_indices:
                y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm{i}")(x)
                outs[f"res{i + 2}"] = y.reshape(b, h, w, dim)
            if i < num_layers - 1:
                x = PatchMerging(dim, dtype=self.dtype, name=f"layers_{i}_downsample")(x, h, w)
                h, w = (h + 1) // 2, (w + 1) // 2
                dim *= 2
        return outs

    def output_shape(self) -> Dict[str, ShapeSpec]:
        return {
            f: ShapeSpec(
                channels=self.embed_dim * 2 ** (int(f[3:]) - 2),
                stride=2 ** int(f[3:]))
            for f in self.out_features
        }


@BACKBONE_REGISTRY.register(name="D2SwinTransformer")
def build_swin_backbone(cfg) -> SwinTransformer:
    s = cfg.MODEL.SWIN
    return SwinTransformer(
        patch_size=s.PATCH_SIZE,
        embed_dim=s.EMBED_DIM,
        depths=tuple(s.DEPTHS),
        num_heads=tuple(s.NUM_HEADS),
        window_size=s.WINDOW_SIZE,
        mlp_ratio=s.MLP_RATIO,
        qkv_bias=s.QKV_BIAS,
        qk_scale=s.QK_SCALE,
        drop_path_rate=s.DROP_PATH_RATE,
        patch_norm=s.PATCH_NORM,
        ape=s.APE,
        out_features=tuple(s.OUT_FEATURES),
        frozen_stages=cfg.MODEL.BACKBONE.FREEZE_AT,
        use_checkpoint=s.USE_CHECKPOINT,
        dtype=compute_dtype(cfg),
    )
