"""2-D sine position embedding (reference position_encoding.py:12-64).

For unpadded (static-shape) batches the mask is all-valid, so the cumsums
reduce to index grids — computed directly, no cumsum needed.
Returns NHWC (B, H, W, C); channel order = (y-features, x-features) like the
reference's cat((pos_y, pos_x), dim=3).
"""

import math
from functools import partial

import jax.numpy as jnp
import numpy as np


def position_embedding_sine(
    h: int,
    w: int,
    num_pos_feats: int = 128,
    temperature: int = 10000,
    normalize: bool = True,
    scale: float | None = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """(H, W, 2*num_pos_feats) sine PE, batch-independent (mask-free)."""
    if scale is None:
        scale = 2 * math.pi
    y_embed = np.arange(1, h + 1, dtype=np.float32)[:, None] * np.ones((1, w), np.float32)
    x_embed = np.ones((h, 1), np.float32) * np.arange(1, w + 1, dtype=np.float32)[None, :]
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (h + eps) * scale
        x_embed = x_embed / (w + eps) * scale

    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    # interleave sin/cos over pairs (reference stacks 0::2 sin, 1::2 cos then flattens)
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])], axis=3).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])], axis=3).reshape(h, w, -1)
    pos = np.concatenate([pos_y, pos_x], axis=2)
    return jnp.asarray(pos, dtype=dtype)


def position_embedding_sine3d(
    t: int,
    h: int,
    w: int,
    num_pos_feats: int = 128,
    temperature: int = 10000,
    scale: float | None = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """(T, H, W, 2*num_pos_feats) sine PE with a temporal term, batch-free
    (reference mask2former_video position_encoding.PositionEmbeddingSine3D,
    normalize=True as constructed at video decoder :280): channels are
    cat(pos_y, pos_x) + pos_z, where pos_z sweeps a 2*num_pos_feats-wide
    frequency ladder over the frame index."""
    if scale is None:
        scale = 2 * math.pi
    z_embed = np.arange(1, t + 1, dtype=np.float32) / (t + 1e-6) * scale
    dim_t_z = np.arange(2 * num_pos_feats, dtype=np.float32)
    dim_t_z = temperature ** (2 * (dim_t_z // 2) / (2 * num_pos_feats))
    pos_z = z_embed[:, None] / dim_t_z  # (T, 2F)
    pos_z = np.stack(
        [np.sin(pos_z[:, 0::2]), np.cos(pos_z[:, 1::2])], axis=2
    ).reshape(t, -1)

    pos_yx = np.asarray(position_embedding_sine(
        h, w, num_pos_feats, temperature, True, scale, jnp.float32))
    pos = pos_yx[None] + pos_z[:, None, None, :]
    return jnp.asarray(pos, dtype=dtype)
