"""Swin backbone parity vs a torch oracle (official Swin structure/names)."""

import math

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from mp_former_tpu.models.backbone.swin import SwinTransformer
from mp_former_tpu.engine.convert import swin_params_from_torch


# -- torch oracle: minimal Swin with official module/param names -----------

def t_window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.view(B, H // ws, ws, W // ws, ws, C)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, ws * ws, C)


def t_window_reverse(win, ws, H, W):
    B = int(win.shape[0] / (H * W / ws / ws))
    x = win.view(B, H // ws, W // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(B, H, W, -1)


class TWindowAttention(tnn.Module):
    def __init__(self, dim, ws, heads):
        super().__init__()
        self.dim, self.ws, self.heads = dim, ws, heads
        self.scale = (dim // heads) ** -0.5
        self.relative_position_bias_table = tnn.Parameter(
            torch.randn((2 * ws - 1) ** 2, heads) * 0.02)
        coords = torch.stack(torch.meshgrid(
            torch.arange(ws), torch.arange(ws), indexing="ij"))
        flat = torch.flatten(coords, 1)
        rel = (flat[:, :, None] - flat[:, None, :]).permute(1, 2, 0).contiguous()
        rel[:, :, 0] += ws - 1
        rel[:, :, 1] += ws - 1
        rel[:, :, 0] *= 2 * ws - 1
        self.register_buffer("relative_position_index", rel.sum(-1))
        self.qkv = tnn.Linear(dim, dim * 3, bias=True)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x, mask=None):
        B_, N, C = x.shape
        qkv = self.qkv(x).reshape(B_, N, 3, self.heads, C // self.heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * self.scale, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(N, N, -1).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B_ // nW, nW, self.heads, N, N) + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.heads, N, N)
        attn = attn.softmax(-1)
        return self.proj((attn @ v).transpose(1, 2).reshape(B_, N, C))


class TBlock(tnn.Module):
    def __init__(self, dim, heads, ws, shift):
        super().__init__()
        self.ws, self.shift = ws, shift
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = TWindowAttention(dim, ws, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = tnn.Sequential()
        self.mlp.fc1 = tnn.Linear(dim, dim * 4)
        self.mlp.fc2 = tnn.Linear(dim * 4, dim)

    def forward(self, x, H, W):
        B, L, C = x.shape
        shortcut = x
        x = self.norm1(x).view(B, H, W, C)
        pad_b = (self.ws - H % self.ws) % self.ws
        pad_r = (self.ws - W % self.ws) % self.ws
        x = TF.pad(x, (0, 0, 0, pad_r, 0, pad_b))
        Hp, Wp = H + pad_b, W + pad_r
        if self.shift:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
            img = torch.zeros(1, Hp, Wp, 1)
            cnt = 0
            for hs in (slice(0, -self.ws), slice(-self.ws, -self.shift), slice(-self.shift, None)):
                for wsl in (slice(0, -self.ws), slice(-self.ws, -self.shift), slice(-self.shift, None)):
                    img[:, hs, wsl, :] = cnt
                    cnt += 1
            mw = t_window_partition(img, self.ws).view(-1, self.ws * self.ws)
            mask = mw.unsqueeze(1) - mw.unsqueeze(2)
            mask = mask.masked_fill(mask != 0, -100.0).masked_fill(mask == 0, 0.0)
        else:
            mask = None
        win = t_window_partition(x, self.ws)
        win = self.attn(win, mask)
        x = t_window_reverse(win, self.ws, Hp, Wp)
        if self.shift:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = x[:, :H, :W].reshape(B, H * W, C)
        x = shortcut + x
        return x + self.mlp.fc2(TF.gelu(self.mlp.fc1(self.norm2(x))))


class TPatchMerging(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.reduction = tnn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = tnn.LayerNorm(4 * dim)

    def forward(self, x, H, W):
        B, L, C = x.shape
        x = x.view(B, H, W, C)
        x = torch.cat([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                       x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1)
        x = x.view(B, -1, 4 * C)
        return self.reduction(self.norm(x))


class TSwin(tnn.Module):
    def __init__(self, embed=8, depths=(2, 2), heads=(2, 4), ws=4):
        super().__init__()
        self.patch_embed = tnn.Sequential()
        self.patch_embed.proj = tnn.Conv2d(3, embed, 4, stride=4)
        self.patch_embed.norm = tnn.LayerNorm(embed)
        self.layers = tnn.ModuleList()
        self.ws = ws
        dim = embed
        for i, d in enumerate(depths):
            stage = tnn.Module()
            stage.blocks = tnn.ModuleList(
                [TBlock(dim, heads[i], ws, 0 if j % 2 == 0 else ws // 2)
                 for j in range(d)])
            if i < len(depths) - 1:
                stage.downsample = TPatchMerging(dim)
            self.layers.append(stage)
            if i < len(depths) - 1:
                dim *= 2
        self.norm0 = tnn.LayerNorm(embed)
        self.norm1 = tnn.LayerNorm(embed * 2)

    def forward(self, x):
        x = self.patch_embed.proj(x)
        B, C, Wh, Ww = x.shape
        x = x.flatten(2).transpose(1, 2)
        x = self.patch_embed.norm(x)
        outs = {}
        H, W = Wh, Ww
        for i, stage in enumerate(self.layers):
            for blk in stage.blocks:
                x = blk(x, H, W)
            norm = getattr(self, f"norm{i}")
            outs[f"res{i + 2}"] = norm(x).view(B, H, W, -1).permute(0, 3, 1, 2)
            if hasattr(stage, "downsample"):
                x = stage.downsample(x, H, W)
                H, W = (H + 1) // 2, (W + 1) // 2
        return outs


def test_swin_matches_torch():
    torch.manual_seed(0)
    tmodel = TSwin().eval()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = swin_params_from_torch(sd)

    model = SwinTransformer(
        patch_size=4, embed_dim=8, depths=(2, 2), num_heads=(2, 4),
        window_size=4, drop_path_rate=0.0,
        out_features=("res2", "res3"))

    x = np.random.RandomState(0).randn(2, 3, 32, 48).astype(np.float32)
    with torch.no_grad():
        want = {k: v.numpy() for k, v in tmodel(torch.from_numpy(x)).items()}
    got = model.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    for k in ("res2", "res3"):
        g = np.asarray(got[k]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(g, want[k], rtol=1e-4, atol=1e-4)


def test_swin_output_shape_metadata():
    m = SwinTransformer(embed_dim=96)
    shapes = m.output_shape()
    assert shapes["res2"].channels == 96 and shapes["res2"].stride == 4
    assert shapes["res5"].channels == 768 and shapes["res5"].stride == 32


def test_swin_ape_param_and_converter():
    """MODEL.SWIN.APE creates the absolute position embedding (resized to
    the live grid, reference swin.py:567-661) and the converter maps the
    torch (1, C, H, W) tensor."""
    import jax

    from mp_former_tpu.engine.convert import swin_params_from_torch
    from mp_former_tpu.models.backbone.swin import SwinTransformer

    m = SwinTransformer(embed_dim=8, depths=(1, 1), num_heads=(2, 2),
                        window_size=4, ape=True, pretrain_img_size=32,
                        patch_size=4, drop_path_rate=0.0,
                        out_features=("res2", "res3"))
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    ape = p["params"]["absolute_pos_embed"]
    assert ape.shape == (1, 8, 8, 8)  # (1, 32/4, 32/4, embed_dim)
    out = m.apply(p, jnp.zeros((1, 64, 64, 3)))
    assert out["res2"].shape == (1, 16, 16, 8)

    sd = {"absolute_pos_embed": np.zeros((1, 8, 5, 7), np.float32),
          "patch_embed.proj.weight": np.zeros((8, 3, 4, 4), np.float32),
          "patch_embed.proj.bias": np.zeros((8,), np.float32)}
    conv = swin_params_from_torch(sd)
    assert conv["absolute_pos_embed"].shape == (1, 5, 7, 8)
