"""Fused masked cross-attention (Pallas/Mosaic TPU kernel).

The Mask2Former decoder's hot attention pattern (reference
mask2former_transformer_decoder.py:535-542): a small query set attends over a
level's pixel tokens under a per-query boolean mask derived from the previous
layer's mask prediction. The XLA path materializes the (B·H, Q, S) score and
mask tensors in HBM per layer; this kernel streams KV blocks flash-attention
style, applying the mask additively inside the softmax accumulation, so
scores never round-trip to HBM (the "second fused-kernel opportunity" in
SURVEY.md §2.4).

Numerics match the XLA path in primitives.MultiheadAttention: masked logits
are set to -1e9 (not -inf) and softmax runs in fp32.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9


def _kernel(q_ref, k_ref, v_ref, msk_ref, o_ref, m_scr, l_scr, a_scr,
            *, scale, kv_blocks):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -1e30)
        l_scr[...] = jnp.zeros_like(l_scr)
        a_scr[...] = jnp.zeros_like(a_scr)

    q = q_ref[0].astype(jnp.float32)           # (Qp, D)
    k = k_ref[0].astype(jnp.float32)           # (BS, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # (Qp, BS)
    s = jnp.where(msk_ref[0], _NEG_INF, s)

    m_prev = m_scr[...]                        # (Qp, 1)
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_cur)
    alpha = jnp.exp(m_prev - m_cur)
    l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    a_scr[...] = a_scr[...] * alpha + jax.lax.dot_general(
        p, v_ref[0].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[...] = m_cur

    @pl.when(j == kv_blocks - 1)
    def _finish():
        o_ref[0] = (a_scr[...] / jnp.maximum(l_scr[...], 1e-30)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def masked_attention(q, k, v, mask, block_s: int = 512,
                     interpret: bool = False):
    """softmax(q·kᵀ/√D + mask·(-1e9)) · v without materializing scores.

    q:    (B, H, Q, D)
    k, v: (B, H, S, D)
    mask: (B, H, Q, S) bool, True = blocked. Rows must have at least one
          visible key (the decoder's degenerate-row fix guarantees this).
    S must be a multiple of block_s (level token counts are powers of two).
    """
    B, H, Q, D = q.shape
    S = k.shape[2]
    assert S % block_s == 0, (S, block_s)
    kv_blocks = S // block_s
    qp = max(8, -(-Q // 8) * 8)  # sublane-align the query block
    if qp != Q:
        pad = [(0, 0), (0, 0), (0, qp - Q), (0, 0)]
        q = jnp.pad(q, pad)
        mask = jnp.pad(mask, [(0, 0), (0, 0), (0, qp - Q), (0, 0)],
                       constant_values=False)  # padded rows attend freely

    bh = B * H
    qf = q.reshape(bh, qp, D)
    kf = k.reshape(bh, S, D)
    vf = v.reshape(bh, S, D)
    mf = mask.reshape(bh, qp, S)

    out = pl.pallas_call(
        functools.partial(_kernel, scale=1.0 / math.sqrt(D),
                          kv_blocks=kv_blocks),
        grid=(bh, kv_blocks),
        in_specs=[
            pl.BlockSpec((1, qp, D), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_s, D), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_s, D), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, qp, block_s), lambda i, j: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, qp, D), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, qp, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((qp, 1), jnp.float32),
            pltpu.VMEM((qp, 1), jnp.float32),
            pltpu.VMEM((qp, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(qf, kf, vf, mf)
    return out.reshape(B, H, qp, D)[:, :, :Q]
