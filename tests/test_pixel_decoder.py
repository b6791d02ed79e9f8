"""Pixel decoder: PE parity vs torch reference math + shape smoke tests."""

import math

import numpy as np
import torch

import jax
import jax.numpy as jnp

from mp_former_tpu.models.transformer_decoder.position_encoding import position_embedding_sine
from mp_former_tpu.models.pixel_decoder.msdeformattn import MSDeformAttnPixelDecoder
from mp_former_tpu.utils.shape_spec import ShapeSpec


def torch_position_embedding_sine(x, num_pos_feats=128, temperature=10000,
                                  normalize=True, scale=None):
    """Verbatim math of reference position_encoding.py:29-53."""
    if scale is None:
        scale = 2 * math.pi
    mask = torch.zeros((x.size(0), x.size(2), x.size(3)), dtype=torch.bool)
    not_mask = ~mask
    y_embed = not_mask.cumsum(1, dtype=torch.float32)
    x_embed = not_mask.cumsum(2, dtype=torch.float32)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * (torch.div(dim_t, 2, rounding_mode="floor")) / num_pos_feats)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = torch.stack((pos_x[:, :, :, 0::2].sin(), pos_x[:, :, :, 1::2].cos()), dim=4).flatten(3)
    pos_y = torch.stack((pos_y[:, :, :, 0::2].sin(), pos_y[:, :, :, 1::2].cos()), dim=4).flatten(3)
    return torch.cat((pos_y, pos_x), dim=3).permute(0, 3, 1, 2)


def test_position_embedding_matches_torch():
    h, w = 13, 21
    want = torch_position_embedding_sine(torch.zeros(1, 256, h, w)).numpy()[0]  # (C,H,W)
    got = np.asarray(position_embedding_sine(h, w, 128)).transpose(2, 0, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pixel_decoder_shapes():
    shapes = {
        "res2": ShapeSpec(channels=16, stride=4),
        "res3": ShapeSpec(channels=32, stride=8),
        "res4": ShapeSpec(channels=64, stride=16),
        "res5": ShapeSpec(channels=128, stride=32),
    }
    dec = MSDeformAttnPixelDecoder(
        input_shape=shapes, conv_dim=32, mask_dim=32, transformer_enc_layers=1,
        transformer_nheads=4,
    )
    rng = np.random.RandomState(0)
    feats = {
        "res2": jnp.asarray(rng.randn(2, 16, 16, 16), jnp.float32),
        "res3": jnp.asarray(rng.randn(2, 8, 8, 32), jnp.float32),
        "res4": jnp.asarray(rng.randn(2, 4, 4, 64), jnp.float32),
        "res5": jnp.asarray(rng.randn(2, 2, 2, 128), jnp.float32),
    }
    params = dec.init(jax.random.PRNGKey(0), feats)
    mask_features, tx_feature, ms = dec.apply(params, feats)
    assert mask_features.shape == (2, 16, 16, 32)
    assert tx_feature.shape == (2, 2, 2, 32)     # res5 level (1/32)
    assert [m.shape for m in ms] == [(2, 2, 2, 32), (2, 4, 4, 32), (2, 8, 8, 32)]
