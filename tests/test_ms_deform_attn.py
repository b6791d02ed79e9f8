"""Parity tests for multi-scale deformable attention.

Port of reference ops/test.py:35-89 — our XLA op vs the reference's
pure-torch oracle `ms_deform_attn_core_pytorch`
(ops/functions/ms_deform_attn_func.py:52-72), values and gradients.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from mp_former_tpu.ops.ms_deform_attn import ms_deform_attn

N, M, D = 1, 2, 2
L = 2
SHAPES = [(6, 4), (3, 2)]
S = sum(h * w for h, w in SHAPES)
Q = S
P = 2


def torch_oracle(value, shapes, sampling_locations, attention_weights):
    """Verbatim math of ms_deform_attn_core_pytorch (reference :52-72)."""
    N_, S_, M_, D_ = value.shape
    _, Lq_, _, L_, P_, _ = sampling_locations.shape
    value_list = value.split([h * w for h, w in shapes], dim=1)
    sampling_grids = 2 * sampling_locations - 1
    sampling_value_list = []
    for lid_, (H_, W_) in enumerate(shapes):
        value_l_ = value_list[lid_].flatten(2).transpose(1, 2).reshape(N_ * M_, D_, H_, W_)
        sampling_grid_l_ = sampling_grids[:, :, :, lid_].transpose(1, 2).flatten(0, 1)
        sampling_value_l_ = F.grid_sample(
            value_l_, sampling_grid_l_, mode="bilinear", padding_mode="zeros",
            align_corners=False)
        sampling_value_list.append(sampling_value_l_)
    attention_weights = attention_weights.transpose(1, 2).reshape(N_ * M_, 1, Lq_, L_ * P_)
    output = (torch.stack(sampling_value_list, dim=-2).flatten(-2) * attention_weights)\
        .sum(-1).view(N_, M_ * D_, Lq_)
    return output.transpose(1, 2).contiguous()


def _make_inputs(seed=3, channels=D, dtype=np.float64):
    rng = np.random.RandomState(seed)
    value = rng.rand(N, S, M, channels).astype(dtype) * 0.01
    sampling_locations = rng.rand(N, Q, M, L, P, 2).astype(dtype)
    attention_weights = rng.rand(N, Q, M, L, P).astype(dtype) + 1e-5
    attention_weights /= attention_weights.sum(-1, keepdims=True).sum(-2, keepdims=True)
    return value, sampling_locations, attention_weights


def test_forward_equal_with_pytorch_double():
    value, loc, attn = _make_inputs(dtype=np.float64)
    want = torch_oracle(
        torch.from_numpy(value), SHAPES, torch.from_numpy(loc), torch.from_numpy(attn)
    ).numpy()
    with jax.enable_x64():
        got = np.asarray(
            ms_deform_attn(jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn))
        )
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_forward_equal_with_pytorch_float():
    value, loc, attn = _make_inputs(dtype=np.float64)
    want = torch_oracle(
        torch.from_numpy(value).float(), SHAPES,
        torch.from_numpy(loc).float(), torch.from_numpy(attn).float(),
    ).numpy()
    got = np.asarray(ms_deform_attn(
        jnp.asarray(value, jnp.float32), SHAPES,
        jnp.asarray(loc, jnp.float32), jnp.asarray(attn, jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-3)


@pytest.mark.parametrize("channels", [30, 32, 64, 71])
def test_gradient_equal_with_pytorch(channels):
    """Replaces reference gradcheck (ops/test.py:66-81): compare our autodiff
    grads against torch autograd through the oracle."""
    value, loc, attn = _make_inputs(channels=channels, dtype=np.float64)

    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(loc).requires_grad_(True)
    ta = torch.from_numpy(attn).requires_grad_(True)
    torch_oracle(tv, SHAPES, tl, ta).sum().backward()

    def f(v, l, a):
        return ms_deform_attn(v, SHAPES, l, a).sum()

    with jax.enable_x64():
        gv, gl, ga = jax.grad(f, argnums=(0, 1, 2))(
            jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn))
    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(), rtol=1e-8, atol=1e-10)


def test_module_init_matches_reference_scheme():
    """Offset bias init = per-head compass grid (reference :66-80)."""
    from mp_former_tpu.ops.ms_deform_attn import MSDeformAttn

    m = MSDeformAttn(d_model=32, n_levels=2, n_heads=4, n_points=2)
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, 5, 32), jnp.float32)
    ref = jnp.asarray(rng.rand(1, 5, 2, 2), jnp.float32)
    flat = jnp.asarray(rng.randn(1, 6 * 4 + 3 * 2, 32), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), q, ref, flat, [(6, 4), (3, 2)])
    bias = np.asarray(params["params"]["sampling_offsets"]["bias"]).reshape(4, 2, 2, 2)
    # head 0 points along +x: (1, 0) scaled by point index
    np.testing.assert_allclose(bias[0, 0, 0], [1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(bias[0, 0, 1], [2.0, 0.0], atol=1e-6)
    # offset weights zero-init
    assert np.all(np.asarray(params["params"]["sampling_offsets"]["kernel"]) == 0)
    out = m.apply(params, q, ref, flat, [(6, 4), (3, 2)])
    assert out.shape == (1, 5, 32)


def test_headshare_engine_matches_packed2x2_on_shared_locations():
    """ms_deform_attn_headshare == ms_deform_attn when every head of the
    packed2x2 path is given the same (head-0) locations."""
    import jax.numpy as jnp
    from mp_former_tpu.ops.ms_deform_attn import (
        ms_deform_attn, ms_deform_attn_headshare)

    rng = np.random.RandomState(0)
    spatial = [(12, 16), (6, 8), (3, 4)]
    B, M, D, P = 2, 4, 8, 4
    Q = 10
    S = sum(h * w for h, w in spatial)
    value = jnp.asarray(rng.randn(B, S, M, D).astype(np.float32))
    loc = jnp.asarray(rng.rand(B, Q, len(spatial), P, 2).astype(np.float32))
    loc = loc * 1.3 - 0.15  # include out-of-image points
    attn = jax.nn.softmax(jnp.asarray(
        rng.randn(B, Q, M, len(spatial) * P).astype(np.float32)), -1
    ).reshape(B, Q, M, len(spatial), P)

    shared = ms_deform_attn_headshare(value, spatial, loc, attn)
    loc_bcast = jnp.broadcast_to(
        loc[:, :, None], (B, Q, M, len(spatial), P, 2))
    ref = ms_deform_attn(value, spatial, loc_bcast, attn)
    np.testing.assert_allclose(
        np.asarray(shared), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_headshare_module_forward_and_grad():
    """MSDeformAttn(sampling_engine='headshare') runs, differs in param
    shapes (shared offsets head), and has finite grads."""
    from mp_former_tpu.ops.ms_deform_attn import MSDeformAttn

    rng = np.random.RandomState(1)
    spatial = [(8, 8), (4, 4)]
    S = sum(h * w for h, w in spatial)
    B, Q, C = 1, 6, 32
    query = jnp.asarray(rng.randn(B, Q, C).astype(np.float32))
    inp = jnp.asarray(rng.randn(B, S, C).astype(np.float32))
    ref_pts = jnp.asarray(rng.rand(B, Q, len(spatial), 2).astype(np.float32))

    m = MSDeformAttn(d_model=C, n_levels=2, n_heads=4, n_points=4,
                     sampling_engine="headshare")
    params = m.init(jax.random.PRNGKey(0), query, ref_pts, inp, spatial)
    k = params["params"]["sampling_offsets"]["kernel"]
    assert k.shape == (C, 2 * 4 * 2)  # L*P*2, no head dim

    def loss(p):
        return jnp.sum(m.apply(p, query, ref_pts, inp, spatial) ** 2)

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
