"""The ACTUAL Pallas tap-weighting kernel body, run on CPU via interpret
mode (the rest of the suite covers only the XLA fallback that
`weight_taps` dispatches to off-TPU — the kernel's block/grid/accumulator
logic had no CPU-runnable coverage)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import mp_former_tpu.ops.tap_weighting as tw


@pytest.fixture(params=["fullane", "slices", "auto"])
def interpret_kernel(monkeypatch, request):
    """Route weight_taps through the real kernel (interpret mode),
    once per kernel variant."""
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(tw.pl, "pallas_call", patched)
    monkeypatch.setattr(tw.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(tw, "_VARIANT", request.param)


@pytest.mark.parametrize("b,q,n_points,n_heads,d,block_q", [
    (1, 64, 4, 8, 32, 0),      # headshare single-image form (_call_one)
    (8, 64, 4, 1, 32, 0),      # packed2x2 per-level batched form (_kernel3)
    (8, 96, 12, 1, 32, 0),     # the old concatenated-levels form
    (2, 100, 4, 1, 32, 0),     # q not a multiple of the block -> pad path
    (8, 128, 4, 1, 32, 64),    # explicit block_q
])
def test_kernel_matches_reference(interpret_kernel, b, q, n_points,
                                  n_heads, d, block_q):
    rng = np.random.RandomState(0)
    taps = jnp.asarray(
        rng.rand(b, n_points * q, 4 * n_heads * d).astype(np.float32))
    w = jnp.asarray(rng.rand(b, n_points * q, 4 * n_heads).astype(np.float32))
    got = np.asarray(tw._weight_taps_fwd_impl(
        taps, w, n_points, n_heads, d, block_q))
    want = np.asarray(tw.weight_taps_reference(taps, w, n_points, n_heads, d))
    assert got.shape == want.shape == (b, q, n_heads * d)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_kernel_bf16_matches_reference(interpret_kernel):
    rng = np.random.RandomState(1)
    b, q, n_points, n_heads, d = 4, 64, 4, 1, 32
    taps = jnp.asarray(rng.rand(b, n_points * q, 4 * d).astype(np.float32),
                       jnp.bfloat16)
    w = jnp.asarray(rng.rand(b, n_points * q, 4).astype(np.float32),
                    jnp.bfloat16)
    got = np.asarray(tw._weight_taps_fwd_impl(
        taps, w, n_points, n_heads, d, 0)).astype(np.float32)
    want = np.asarray(tw.weight_taps_reference(
        taps, w, n_points, n_heads, d)).astype(np.float32)
    # bf16 accumulation differences: kernel accumulates in f32 scratch
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)
