"""Tap-weighting op: reference math, custom VJP, and engine integration.

The Pallas kernel itself only compiles on TPU (validated there — bf16 rel
err 2.3e-3 at model shapes incl. ragged Q); on CPU `weight_taps` falls back
to the XLA reference implementation, so these tests pin the math and the
hand-written backward.
"""

import numpy as np

import jax
import jax.numpy as jnp

from mp_former_tpu.ops.tap_weighting import weight_taps, weight_taps_reference


def _inputs(seed=0, b=2, p=4, q=40, t=4, m=8, d=32):
    rng = np.random.RandomState(seed)
    taps = jnp.asarray(rng.randn(b, p * q, t * m * d).astype(np.float32))
    w = jnp.asarray(rng.rand(b, p * q, t * m).astype(np.float32))
    return taps, w


def test_weight_taps_matches_reference():
    taps, w = _inputs()
    got = weight_taps(taps, w, 4, 8, 32)
    want = weight_taps_reference(taps, w, 4, 8, 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_weight_taps_vjp_matches_autodiff():
    taps, w = _inputs(b=1, q=16)

    def via_custom(a, b_):
        return (weight_taps(a, b_, 4, 8, 32) ** 2).sum()

    def via_ref(a, b_):
        return (weight_taps_reference(a, b_, 4, 8, 32) ** 2).sum()

    g1 = jax.grad(via_custom, argnums=(0, 1))(taps, w)
    g2 = jax.grad(via_ref, argnums=(0, 1))(taps, w)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_headshare_engine_pallas_flag_matches_xla_path():
    """With pallas_weighting=True on CPU (reference fallback), the headshare
    engine must produce the same output as its default weighting path."""
    from mp_former_tpu.ops.ms_deform_attn import ms_deform_attn_headshare

    rng = np.random.RandomState(1)
    spatial = [(12, 16), (6, 8)]
    B, M, D, P, Q = 1, 4, 8, 4, 10
    S = sum(h * w for h, w in spatial)
    value = jnp.asarray(rng.randn(B, S, M, D).astype(np.float32))
    loc = jnp.asarray(rng.rand(B, Q, len(spatial), P, 2).astype(np.float32)) * 1.2 - 0.1
    attn = jax.nn.softmax(jnp.asarray(
        rng.randn(B, Q, M, len(spatial) * P).astype(np.float32)), -1
    ).reshape(B, Q, M, len(spatial), P)

    a = ms_deform_attn_headshare(value, spatial, loc, attn, pallas_weighting=False)
    b = ms_deform_attn_headshare(value, spatial, loc, attn, pallas_weighting=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
