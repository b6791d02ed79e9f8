"""Transformer building blocks (reference mask2former_transformer_decoder.py:19-206).

`MultiheadAttention` reproduces torch nn.MultiheadAttention math (packed QKV
projections are split at checkpoint-conversion time). Attention masks follow
torch semantics: boolean, True = blocked. Layers come in pre/post-norm
variants like the reference's SelfAttentionLayer/CrossAttentionLayer/FFNLayer.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

_NEG_INF = -1e9  # large-negative additive mask (fp32-safe, bf16-safe)


class MultiheadAttention(nn.Module):
    """torch nn.MultiheadAttention equivalent (batch-first interface).

    q/k/v/out projections as separate Dense modules named q_proj/k_proj/
    v_proj/out_proj (converter splits torch's packed in_proj_weight).
    """

    embed_dim: int
    num_heads: int
    fused: bool = False  # TPU.FUSED_MASKED_ATTN: pallas flash-style kernel
    dropout: float = 0.0  # attention-probability dropout (torch semantics)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jax.Array,    # (B, Q, C)
        key: jax.Array,      # (B, S, C)
        value: jax.Array,    # (B, S, C)
        attn_mask: Optional[jax.Array] = None,  # bool (B*H, Q, S) | (B, H, Q, S) | (Q, S); True=blocked
        *,
        train: bool = False,
    ) -> jax.Array:
        B, Q, C = query.shape
        S = key.shape[1]
        H = self.num_heads
        D = C // H

        q = nn.Dense(C, dtype=self.dtype, name="q_proj")(query)
        k = nn.Dense(C, dtype=self.dtype, name="k_proj")(key)
        v = nn.Dense(C, dtype=self.dtype, name="v_proj")(value)

        q = q.reshape(B, Q, H, D).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, H, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, H, D).transpose(0, 2, 1, 3)

        if attn_mask is not None:
            if attn_mask.ndim == 2:
                m = jnp.broadcast_to(attn_mask[None, None], (B, H, Q, S))
            elif attn_mask.ndim == 3:
                m = attn_mask.reshape(B, H, Q, S)
            else:
                m = attn_mask
        else:
            m = None

        if self.fused and m is not None and S % 512 == 0 \
                and jax.default_backend() == "tpu":
            from ...ops.fused_masked_attention import masked_attention

            out = masked_attention(q, k, v, m)
        else:
            logits = jnp.einsum("bhqd,bhsd->bhqs", q, k) / jnp.sqrt(D).astype(q.dtype)
            if m is not None:
                logits = jnp.where(m, _NEG_INF, logits)
            attn = jax.nn.softmax(logits, axis=-1)
            if self.dropout > 0:
                # torch nn.MultiheadAttention drops attention WEIGHTS
                # (the fused kernel path has no dropout; it is eval-only)
                attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
            out = jnp.einsum("bhqs,bhsd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Q, C)
        return nn.Dense(C, dtype=self.dtype, name="out_proj")(out)


def _activation(name: str) -> Callable[[jax.Array], jax.Array]:
    return {"relu": nn.relu, "gelu": nn.gelu, "glu": nn.glu}[name]


class SelfAttentionLayer(nn.Module):
    d_model: int
    nhead: int
    dropout: float = 0.0
    activation: str = "relu"
    normalize_before: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, tgt_mask=None, query_pos=None, *, train: bool = False):
        def attend(x):
            qk = x if query_pos is None else x + query_pos
            return MultiheadAttention(self.d_model, self.nhead,
                                      dropout=self.dropout, dtype=self.dtype,
                                      name="self_attn")(qk, qk, x, attn_mask=tgt_mask,
                                                        train=train)

        drop = nn.Dropout(self.dropout, deterministic=not train)
        if self.normalize_before:
            tgt2 = nn.LayerNorm(dtype=self.dtype, name="norm")(tgt)
            return tgt + drop(attend(tgt2))
        tgt = tgt + drop(attend(tgt))
        return nn.LayerNorm(dtype=self.dtype, name="norm")(tgt)


class CrossAttentionLayer(nn.Module):
    d_model: int
    nhead: int
    dropout: float = 0.0
    activation: str = "relu"
    normalize_before: bool = False
    fused_attn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, memory_mask=None, pos=None, query_pos=None,
                 *, train: bool = False):
        def attend(x):
            q = x if query_pos is None else x + query_pos
            k = memory if pos is None else memory + pos
            return MultiheadAttention(self.d_model, self.nhead,
                                      fused=self.fused_attn,
                                      dropout=self.dropout, dtype=self.dtype,
                                      name="multihead_attn")(q, k, memory, attn_mask=memory_mask,
                                                             train=train)

        drop = nn.Dropout(self.dropout, deterministic=not train)
        if self.normalize_before:
            tgt2 = nn.LayerNorm(dtype=self.dtype, name="norm")(tgt)
            return tgt + drop(attend(tgt2))
        tgt = tgt + drop(attend(tgt))
        return nn.LayerNorm(dtype=self.dtype, name="norm")(tgt)


class FFNLayer(nn.Module):
    d_model: int
    dim_feedforward: int = 2048
    dropout: float = 0.0
    activation: str = "relu"
    normalize_before: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, *, train: bool = False):
        act = _activation(self.activation)
        drop = nn.Dropout(self.dropout, deterministic=not train)

        def ffn(x):
            h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
            h = drop(act(h))
            return nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)

        if self.normalize_before:
            tgt2 = nn.LayerNorm(dtype=self.dtype, name="norm")(tgt)
            return tgt + drop(ffn(tgt2))
        tgt = tgt + drop(ffn(tgt))
        return nn.LayerNorm(dtype=self.dtype, name="norm")(tgt)


class MLP(nn.Module):
    """DETR-style MLP (reference :193-206)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            dim = self.output_dim if last else self.hidden_dim
            x = nn.Dense(dim, dtype=self.dtype, name=f"layers_{i}")(x)
            if not last:
                x = nn.relu(x)
        return x
