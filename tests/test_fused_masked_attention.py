"""Pallas fused masked attention vs the XLA reference path (interpret mode)."""

import numpy as np

import jax
import jax.numpy as jnp

from mp_former_tpu.ops.fused_masked_attention import masked_attention


def _reference(q, k, v, mask):
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhsd->bhqs", q, k) / np.sqrt(d)
    s = jnp.where(mask, -1e9, s)
    return jnp.einsum("bhqs,bhsd->bhqd", jax.nn.softmax(s, axis=-1), v)


def test_matches_xla_path():
    rng = np.random.RandomState(0)
    B, H, Q, S, D = 2, 4, 100, 1024, 32
    q = jnp.asarray(rng.randn(B, H, Q, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, S, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, S, D).astype(np.float32))
    mask = jnp.asarray(rng.rand(B, H, Q, S) < 0.7)
    mask = mask & (jnp.arange(S) > 0)  # keep every row attendable
    got = masked_attention(q, k, v, mask, block_s=256, interpret=True)
    want = _reference(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_unmasked_rows_and_single_block():
    rng = np.random.RandomState(1)
    B, H, Q, S, D = 1, 2, 7, 512, 32  # Q not sublane-aligned -> padding path
    q = jnp.asarray(rng.randn(B, H, Q, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, S, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, S, D).astype(np.float32))
    mask = jnp.zeros((B, H, Q, S), bool)
    got = masked_attention(q, k, v, mask, block_s=512, interpret=True)
    want = _reference(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
