"""Parity of the Pallas MSDA kernel vs the packed2x2 XLA engine.

The kernel must be bit-compatible in SEMANTICS (same taps, same weights,
reference per-head sampling locations) — only the execution strategy
differs, so a tight tolerance against `ms_deform_attn` pins it. Runs the
kernel in interpreter mode (the Mosaic compile path is exercised on the
chip by tools/probe_msda_kernel.py and the ref_exact bench line).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mp_former_tpu.ops.ms_deform_attn import ms_deform_attn
from mp_former_tpu.ops.msda_pallas import (_msda_pallas_impl,
                                           msda_pallas_supported)

SHAPES = [(16, 16), (8, 8), (4, 4)]


def _rand_inputs(key, B=2, Q=37, M=8, D=32, P=4, dtype=jnp.float32,
                 shapes=SHAPES):
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    k1, k2, k3 = jax.random.split(key, 3)
    value = jax.random.normal(k1, (B, S, M, D), dtype=jnp.float32)
    # include out-of-range locations to exercise the zero-padding border
    loc = jax.random.uniform(k2, (B, Q, M, L, P, 2), minval=-0.2, maxval=1.2)
    attn = jax.nn.softmax(
        jax.random.normal(k3, (B, Q, M, L * P)), axis=-1
    ).reshape(B, Q, M, L, P)
    return (value.astype(dtype), loc.astype(dtype), attn.astype(dtype))


def test_kernel_matches_xla_fp32():
    value, loc, attn = _rand_inputs(jax.random.PRNGKey(0))
    ref = ms_deform_attn(value, SHAPES, loc, attn)
    got = _msda_pallas_impl(value, loc, attn, SHAPES, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_kernel_matches_xla_bf16():
    value, loc, attn = _rand_inputs(jax.random.PRNGKey(1), dtype=jnp.bfloat16)
    # fp32 ground truth; both engines run bf16 inputs
    ref32 = ms_deform_attn(value.astype(jnp.float32), SHAPES,
                           loc.astype(jnp.float32),
                           attn.astype(jnp.float32))
    got = _msda_pallas_impl(value, loc, attn, SHAPES, interpret=True)
    # kernel accumulates in fp32 from bf16 taps — must be at least as close
    # to the fp32 truth as bf16 rounding allows
    err = np.abs(np.asarray(got, np.float32) - np.asarray(ref32))
    scale = np.abs(np.asarray(ref32)).max()
    assert err.max() / scale < 2e-2, err.max() / scale


def test_kernel_q_padding_and_odd_q():
    # Q not a multiple of the 512-query block exercises the pad/slice path
    value, loc, attn = _rand_inputs(jax.random.PRNGKey(2), Q=700)
    ref = ms_deform_attn(value, SHAPES, loc, attn)
    got = _msda_pallas_impl(value, loc, attn, SHAPES, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_supported_predicate():
    assert msda_pallas_supported(SHAPES, 4, 32, jnp.bfloat16)
    # a 1333px-class level-0 table blows the VMEM budget -> fallback
    assert not msda_pallas_supported([(168, 168)], 4, 32, jnp.bfloat16)
    assert not msda_pallas_supported(SHAPES, 4, 64, jnp.bfloat16)


def test_custom_vjp_backward_matches_xla():
    value, loc, attn = _rand_inputs(jax.random.PRNGKey(3), B=1, Q=13)
    from mp_former_tpu.ops.msda_pallas import ms_deform_attn_pallas
    shapes = tuple(SHAPES)

    def f_pallas(v, l, a):
        return ms_deform_attn_pallas(v, l, a, shapes).sum()

    def f_xla(v, l, a):
        return ms_deform_attn(v, shapes, l, a).sum()

    g_p = jax.grad(f_pallas, argnums=(0, 1, 2))(value, loc, attn)
    g_x = jax.grad(f_xla, argnums=(0, 1, 2))(value, loc, attn)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_packed2x2_pallas_weighting_matches_plain():
    """The packed2x2 engine's pallas_weighting path (batched weight_taps,
    n_heads=1, batch=B*M) must equal the plain XLA reduce. Off-TPU the
    kernel falls back to weight_taps_reference, which pins the data layout
    (point-major, folded bilinear*attention weights)."""
    value, loc, attn = _rand_inputs(jax.random.PRNGKey(7), B=2, Q=53)
    ref = ms_deform_attn(value, SHAPES, loc, attn)
    got = ms_deform_attn(value, SHAPES, loc, attn, pallas_weighting=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
