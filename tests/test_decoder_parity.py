"""Transformer-decoder forward parity vs a torch oracle built from the
reference's structure (SelfAttention/CrossAttention/FFN layers with
nn.MultiheadAttention, masked cross-attention, degenerate-row fix, per-layer
prediction heads — reference mask2former_transformer_decoder.py:427-555).
Weights flow through our converter, so this also pins the conversion."""

import math

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from mp_former_tpu.engine.checkpoint_import import convert_predictor
from mp_former_tpu.models.transformer_decoder.mask2former_decoder import (
    MultiScaleMaskedTransformerDecoder)

C, HEADS, Q, K, LAYERS = 32, 4, 6, 5, 3
MASK_DIM = 32
SIZES = [(4, 4), (8, 8), (16, 16)]


def t_pe(h, w, npf):
    y = torch.arange(1, h + 1, dtype=torch.float32)[:, None].expand(h, w)
    x = torch.arange(1, w + 1, dtype=torch.float32)[None, :].expand(h, w)
    scale = 2 * math.pi
    eps = 1e-6
    y = y / (h + eps) * scale
    x = x / (w + eps) * scale
    dim_t = torch.arange(npf, dtype=torch.float32)
    dim_t = 10000 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / npf)
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    px = torch.stack((px[:, :, 0::2].sin(), px[:, :, 1::2].cos()), 3).flatten(2)
    py = torch.stack((py[:, :, 0::2].sin(), py[:, :, 1::2].cos()), 3).flatten(2)
    return torch.cat((py, px), 2).permute(2, 0, 1)  # (C, h, w)


class TorchDecoder(tnn.Module):
    """Reference decoder skeleton with reference state-dict names."""

    def __init__(self):
        super().__init__()
        self.transformer_self_attention_layers = tnn.ModuleList()
        self.transformer_cross_attention_layers = tnn.ModuleList()
        self.transformer_ffn_layers = tnn.ModuleList()
        for _ in range(LAYERS):
            sa = tnn.Module()
            sa.self_attn = tnn.MultiheadAttention(C, HEADS)
            sa.norm = tnn.LayerNorm(C)
            self.transformer_self_attention_layers.append(sa)
            ca = tnn.Module()
            ca.multihead_attn = tnn.MultiheadAttention(C, HEADS)
            ca.norm = tnn.LayerNorm(C)
            self.transformer_cross_attention_layers.append(ca)
            ff = tnn.Module()
            ff.linear1 = tnn.Linear(C, 64)
            ff.linear2 = tnn.Linear(64, C)
            ff.norm = tnn.LayerNorm(C)
            self.transformer_ffn_layers.append(ff)
        self.decoder_norm = tnn.LayerNorm(C)
        self.query_feat = tnn.Embedding(Q, C)
        self.level_embed = tnn.Embedding(3, C)
        self.class_embed = tnn.Linear(C, K + 1)
        self.mask_embed = tnn.Module()
        self.mask_embed.layers = tnn.ModuleList(
            [tnn.Linear(C, C), tnn.Linear(C, C), tnn.Linear(C, MASK_DIM)])

    def heads(self, output, mask_features, size):
        dec = self.decoder_norm(output).transpose(0, 1)  # (B, Q, C)
        cls = self.class_embed(dec)
        memb = dec
        for i, l in enumerate(self.mask_embed.layers):
            memb = l(memb)
            if i < 2:
                memb = TF.relu(memb)
        om = torch.einsum("bqc,bchw->bqhw", memb, mask_features)
        am = TF.interpolate(om, size=size, mode="bilinear", align_corners=False)
        am = (am.sigmoid().flatten(2).unsqueeze(1).repeat(1, HEADS, 1, 1)
              .flatten(0, 1) < 0.5).bool()
        return cls, om, am.detach()

    def forward(self, x, mask_features):
        src, pos = [], []
        for i, xi in enumerate(x):
            h, w = xi.shape[-2:]
            pos.append(t_pe(h, w, C // 2).flatten(1).permute(1, 0).unsqueeze(1))
            src.append(xi.flatten(2).permute(2, 0, 1)
                       + self.level_embed.weight[i][None, None, :])
        bs = x[0].shape[0]
        output = self.query_feat.weight.unsqueeze(1).repeat(1, bs, 1)
        cls, om, am = self.heads(output, mask_features, SIZES[0])
        for i in range(LAYERS):
            lvl = i % 3
            am[torch.where(am.sum(-1) == am.shape[-1])] = False
            ca = self.transformer_cross_attention_layers[i]
            out2 = ca.multihead_attn(
                query=output, key=src[lvl] + pos[lvl], value=src[lvl],
                attn_mask=am)[0]
            output = ca.norm(output + out2)
            sa = self.transformer_self_attention_layers[i]
            out2 = sa.self_attn(output, output, value=output)[0]
            output = sa.norm(output + out2)
            ff = self.transformer_ffn_layers[i]
            output = ff.norm(output + ff.linear2(TF.relu(ff.linear1(output))))
            cls, om, am = self.heads(
                output, mask_features, SIZES[(i + 1) % 3])
        return cls, om


def test_decoder_matches_torch():
    torch.manual_seed(0)
    tdec = TorchDecoder().eval()
    sd = {k: v.numpy() for k, v in tdec.state_dict().items()}
    sd = {f"sem_seg_head.predictor.{k}": v for k, v in sd.items()}
    params = convert_predictor(sd)

    rng = np.random.RandomState(0)
    x_t = [torch.randn(1, C, h, w) for h, w in SIZES]
    mf_t = torch.randn(1, MASK_DIM, 32, 32)
    with torch.no_grad():
        want_cls, want_mask = tdec(x_t, mf_t)

    dec = MultiScaleMaskedTransformerDecoder(
        in_channels=C, num_classes=K, hidden_dim=C, num_queries=Q,
        nheads=HEADS, dim_feedforward=64, dec_layers=LAYERS, mask_dim=MASK_DIM)
    x_j = [jnp.asarray(t.numpy().transpose(0, 2, 3, 1)) for t in x_t]
    mf_j = jnp.asarray(mf_t.numpy().transpose(0, 2, 3, 1))
    out = dec.apply({"params": params}, x_j, mf_j, None)

    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), want_cls.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out["pred_masks"]), want_mask.numpy(), rtol=2e-4, atol=2e-4)
