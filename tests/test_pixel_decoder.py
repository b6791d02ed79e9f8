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


def test_scan_encoder_matches_unrolled():
    """TPU.SCAN_ENCODER rolls the 6 identical layers into one lax.scan;
    with stacked copies of the unrolled params it must be the same math."""
    from mp_former_tpu.models.pixel_decoder.msdeformattn import (
        MSDeformAttnTransformerEncoderOnly)

    kw = dict(d_model=32, nhead=4, num_encoder_layers=3, dim_feedforward=64,
              dropout=0.0, num_feature_levels=3, enc_n_points=4, remat=False)
    rng = np.random.RandomState(0)
    srcs = [jnp.asarray(rng.randn(2, h, w, 32), jnp.float32)
            for (h, w) in [(8, 8), (4, 4), (2, 2)]]
    pos = [jnp.asarray(rng.randn(2, h, w, 32), jnp.float32)
           for (h, w) in [(8, 8), (4, 4), (2, 2)]]

    unrolled = MSDeformAttnTransformerEncoderOnly(**kw)
    p = unrolled.init(jax.random.PRNGKey(0), srcs, pos)["params"]
    out_u, _ = unrolled.apply({"params": p}, srcs, pos)

    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[p[f"encoder_layers_{i}"] for i in range(3)])
    p_scan = {"level_embed": p["level_embed"],
              "encoder_scan": {"layer": stacked}}
    scanned = MSDeformAttnTransformerEncoderOnly(scan_layers=True, **kw)
    # param-tree layout check: init produces the same structure we stacked
    p_init = scanned.init(jax.random.PRNGKey(0), srcs, pos)["params"]
    assert jax.tree_util.tree_structure(p_init) == \
        jax.tree_util.tree_structure(p_scan)
    out_s, _ = scanned.apply({"params": p_scan}, srcs, pos)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_u),
                               rtol=1e-5, atol=1e-5)


def test_scan_encoder_bf16_traces():
    """The scan carry must be dtype-stable under bf16 compute (the input
    projections' GroupNorm promotes to f32; regression for the trace-time
    carry-dtype mismatch)."""
    from mp_former_tpu.models.pixel_decoder.msdeformattn import (
        MSDeformAttnTransformerEncoderOnly)

    enc = MSDeformAttnTransformerEncoderOnly(
        d_model=32, nhead=4, num_encoder_layers=2, dim_feedforward=64,
        dropout=0.0, num_feature_levels=3, enc_n_points=4, remat=False,
        scan_layers=True, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    srcs = [jnp.asarray(rng.randn(1, h, w, 32), jnp.float32)
            for (h, w) in [(8, 8), (4, 4), (2, 2)]]
    pos = [jnp.asarray(rng.randn(1, h, w, 32), jnp.float32)
           for (h, w) in [(8, 8), (4, 4), (2, 2)]]
    params = enc.init(jax.random.PRNGKey(0), srcs, pos)["params"]
    out, _ = enc.apply({"params": params}, srcs, pos)
    assert out.dtype == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(out, np.float32)))


def test_scan_encoder_grad_with_remat():
    """Scan composes with per-layer remat under autodiff (training path)."""
    from mp_former_tpu.models.pixel_decoder.msdeformattn import (
        MSDeformAttnTransformerEncoderOnly)

    enc = MSDeformAttnTransformerEncoderOnly(
        d_model=32, nhead=4, num_encoder_layers=2, dim_feedforward=64,
        dropout=0.0, num_feature_levels=3, enc_n_points=4, remat=True,
        scan_layers=True)
    rng = np.random.RandomState(0)
    srcs = [jnp.asarray(rng.randn(1, h, w, 32), jnp.float32)
            for (h, w) in [(8, 8), (4, 4), (2, 2)]]
    pos = [jnp.asarray(rng.randn(1, h, w, 32), jnp.float32)
           for (h, w) in [(8, 8), (4, 4), (2, 2)]]
    params = enc.init(jax.random.PRNGKey(0), srcs, pos)["params"]

    def loss(p):
        out, _ = enc.apply({"params": p}, srcs, pos, train=True,
                           rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


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
