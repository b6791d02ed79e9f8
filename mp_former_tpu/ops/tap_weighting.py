"""Pallas TPU kernel for the deformable-attention tap weighting.

The head-shared sampling engine gathers rows of shape (4*M*D,) — the 2x2
bilinear taps of all M heads for one (query, point) — and then reduces
them with per-(point, tap, head) weights:

    out[q, m, d] = sum_{p, t} taps[(p, q), (t, m, d)] * w[(p, q), (t, m)]

Every XLA formulation of this reduction (multiply+reduce, 0/1-stack matmul,
slice-adds, batched matvec) transposes the taps tensor for its reduce —
~40 ms/img of layout copies at 1024px (PERFORMANCE.md round 2). The taps
only need to be READ ONCE: this kernel streams them through VMEM, does the
multiply-accumulate on the VPU with lane-aligned slices, and accumulates the
point sum across grid steps in the revisited output block.

Rows are point-major ((p, q) order) so each grid step's q-block is
contiguous; the output block index depends only on q, so the P revisits are
consecutive and accumulate in VMEM.

Forward-only kernel with a custom VJP whose backward is plain XLA (training
spends its time elsewhere; the backward of a weighting is two multiplies).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Kernel variant: "fullane" keeps the f32 accumulator in the taps' full
# (bq, T*M*D) lane space — one full-width conversion+multiply+add per grid
# step, weights lane-expanded by a tiny (bq, TM)@(TM, TMD) 0/1 matmul, and
# the taps->heads reduction deferred to ONE (bq, TMD)@(TMD, MD) matmul at
# emit. "slices" is the original formulation (per-(tap, head) d-wide VPU
# slices — only d=32 of 128 lanes busy; round-5 profile measured it ~4x off
# HBM speed-of-light for its reads, and the block sweep ruled out grid
# overhead, leaving the narrow VPU ops as the cost). "auto" (default)
# resolves to fullane: it measured faster at BOTH call shapes on v5e
# (tools/bench_tap_weighting.py round 5 — packed2x2 n_heads=1/tmd=128:
# 5.75 vs 6.30 ms; headshare tmd=1024: 2.42 vs 3.24 ms/layer); "slices"
# remains selectable for A/Bs.
_VARIANT = os.environ.get("MPF_TAP_WEIGHTING_VARIANT", "auto")


def _use_fullane(n_heads: int) -> bool:
    return _VARIANT != "slices"


def _lane_expand(w32, n_tm, tmd, d):
    """(bq, TM) weights -> (bq, TMD): lane l carries w[:, l // d]."""
    sel = (jax.lax.broadcasted_iota(jnp.int32, (n_tm, tmd), 1) // d
           == jax.lax.broadcasted_iota(jnp.int32, (n_tm, tmd), 0))
    return jax.lax.dot(w32, sel.astype(jnp.float32),
                       preferred_element_type=jnp.float32)


def _head_reduce(acc, tmd, md):
    """(bq, TMD) f32 -> (bq, MD): sum lanes with equal l % MD (lane order is
    (t, m, d)-major, so t-duplicates of one (m, d) lane are MD apart)."""
    sel = (jax.lax.broadcasted_iota(jnp.int32, (tmd, md), 0) % md
           == jax.lax.broadcasted_iota(jnp.int32, (tmd, md), 1))
    return jax.lax.dot(acc, sel.astype(jnp.float32),
                       preferred_element_type=jnp.float32)


def _kernel_fl(taps_ref, w_ref, o_ref, acc_ref, *, n_taps: int, n_heads: int,
               d: int, n_points: int):
    p = pl.program_id(1)
    tm = n_taps * n_heads
    tmd = tm * d
    term = taps_ref[...].astype(jnp.float32) * _lane_expand(
        w_ref[...].astype(jnp.float32), tm, tmd, d)

    @pl.when(p == 0)
    def _init():
        acc_ref[...] = term

    @pl.when(p != 0)
    def _accum():
        acc_ref[...] += term

    @pl.when(p == n_points - 1)
    def _emit():
        o_ref[...] = _head_reduce(acc_ref[...], tmd,
                                  n_heads * d).astype(o_ref.dtype)


def _kernel3_fl(taps_ref, w_ref, o_ref, acc_ref, *, n_taps: int,
                n_heads: int, d: int, n_points: int):
    p = pl.program_id(2)
    tm = n_taps * n_heads
    tmd = tm * d
    term = taps_ref[0].astype(jnp.float32) * _lane_expand(
        w_ref[0].astype(jnp.float32), tm, tmd, d)

    @pl.when(p == 0)
    def _init():
        acc_ref[...] = term

    @pl.when(p != 0)
    def _accum():
        acc_ref[...] += term

    @pl.when(p == n_points - 1)
    def _emit():
        o_ref[0] = _head_reduce(acc_ref[...], tmd,
                                n_heads * d).astype(o_ref.dtype)


def _kernel(taps_ref, w_ref, o_ref, acc_ref, *, n_taps: int, n_heads: int,
            d: int, n_points: int):
    p = pl.program_id(1)

    for m in range(n_heads):
        acc = None
        for t in range(n_taps):
            k = t * n_heads + m
            term = (taps_ref[:, k * d:(k + 1) * d].astype(jnp.float32)
                    * w_ref[:, k:k + 1].astype(jnp.float32))
            acc = term if acc is None else acc + term

        @pl.when(p == 0)
        def _init():
            acc_ref[:, m * d:(m + 1) * d] = acc

        @pl.when(p != 0)
        def _accum():
            acc_ref[:, m * d:(m + 1) * d] += acc

    @pl.when(p == n_points - 1)
    def _emit():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def weight_taps_reference(taps, w, n_points, n_heads, d):
    """out[b, q, (m d)] = sum_{p, t} taps[b, (p q), (t m d)] * w[b, (p q), (t m)]."""
    b, pq, tmd = taps.shape
    q = pq // n_points
    t = tmd // (n_heads * d)
    wt = (taps.reshape(b, n_points, q, t, n_heads, d)
          * w.reshape(b, n_points, q, t, n_heads)[..., None].astype(taps.dtype))
    return wt.sum(axis=(1, 3)).reshape(b, q, n_heads * d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def weight_taps(taps, w, n_points, n_heads, d, block_q=0):
    """Pallas on TPU, XLA elsewhere. taps (B, P*Q, T*M*D) bf16/f32,
    w (B, P*Q, T*M), returns (B, Q, M*D) in taps.dtype.

    block_q: q-rows per grid step (0 = auto). Bigger blocks amortize the
    per-grid-step overhead (~1-2 us/step dominates at 1024-row blocks —
    round-5 profile measured the kernel 4x off HBM bandwidth); the auto
    choice picks the largest divisor-friendly block that keeps the
    double-buffered taps + f32 accumulator within a few MB of VMEM."""
    return _weight_taps_fwd_impl(taps, w, n_points, n_heads, d, block_q)


def _auto_block_q(q, tmd, fullane):
    """Default q-block: the conservative pre-round-5 choice (Mosaic's
    scoped-vmem accounting rejects blocks well below the naive byte budget —
    a 7168-row taps block OOMs scoped vmem at 24.3M/16M). Call sites that
    measured a larger block pass block_q explicitly. The fullane variant's
    accumulator lives in the full (bq, tmd) lane space, so wide-row call
    shapes (headshare: tmd=1024) halve the block to stay in scoped VMEM;
    for the narrow ref-exact shape (tmd=128) the round-5 v5e sweep put the
    optimum at 1536 rows on large levels."""
    if fullane and tmd >= 512:
        return 512
    if fullane and q > 8192:
        return 1536
    return 1024 if q % 1024 == 0 or q > 8192 else 512


def _weight_taps_fwd_impl(taps, w, n_points, n_heads, d, block_q=0):
    if jax.default_backend() != "tpu":
        return weight_taps_reference(taps, w, n_points, n_heads, d)
    b, pq, tmd = taps.shape
    q = pq // n_points
    n_taps = tmd // (n_heads * d)
    md = n_heads * d

    fullane = _use_fullane(n_heads)
    bq = block_q or _auto_block_q(q, tmd, fullane)
    q_pad = (q + bq - 1) // bq * bq
    if q_pad != q:
        # pad each point's q-block (rows are point-major)
        taps = taps.reshape(b, n_points, q, tmd)
        taps = jnp.pad(taps, ((0, 0), (0, 0), (0, q_pad - q), (0, 0)))
        taps = taps.reshape(b, n_points * q_pad, tmd)
        w = w.reshape(b, n_points, q, w.shape[-1])
        w = jnp.pad(w, ((0, 0), (0, 0), (0, q_pad - q), (0, 0)))
        w = w.reshape(b, n_points * q_pad, w.shape[-1])

    acc_cols = tmd if fullane else md
    if b == 1:
        kern = functools.partial(_kernel_fl if fullane else _kernel,
                                 n_taps=n_taps, n_heads=n_heads,
                                 d=d, n_points=n_points)
        out = _call_one(kern, taps[0], w[0], q_pad, bq, n_points,
                        tmd, n_taps, n_heads, md, taps.dtype, acc_cols)[None]
    else:
        # batched grid: one launch for all b (the packed2x2 engine batches
        # B*M head-tables here; a python loop would pay the ~0.4 ms launch
        # overhead b times per layer)
        kern = functools.partial(_kernel3_fl if fullane else _kernel3,
                                 n_taps=n_taps, n_heads=n_heads,
                                 d=d, n_points=n_points)
        out = _call_batched(kern, taps, w, b, q_pad, bq, n_points,
                            tmd, n_taps, n_heads, md, taps.dtype, acc_cols)
    return out[:, :q]


def _kernel3(taps_ref, w_ref, o_ref, acc_ref, *, n_taps: int, n_heads: int,
             d: int, n_points: int):
    """3D-blocked variant of _kernel: grid (b, q-blocks, points), blocks
    carry a leading batch dim of 1."""
    p = pl.program_id(2)

    for m in range(n_heads):
        acc = None
        for t in range(n_taps):
            k = t * n_heads + m
            term = (taps_ref[0, :, k * d:(k + 1) * d].astype(jnp.float32)
                    * w_ref[0, :, k:k + 1].astype(jnp.float32))
            acc = term if acc is None else acc + term

        @pl.when(p == 0)
        def _init():
            acc_ref[:, m * d:(m + 1) * d] = acc

        @pl.when(p != 0)
        def _accum():
            acc_ref[:, m * d:(m + 1) * d] += acc

    @pl.when(p == n_points - 1)
    def _emit():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def _call_batched(kern, taps, w, b, q_pad, bq, n_points, tmd, n_taps,
                  n_heads, md, out_dtype, acc_cols):
    nq = q_pad // bq
    return pl.pallas_call(
        kern,
        grid=(b, nq, n_points),
        in_specs=[
            pl.BlockSpec((1, bq, tmd),
                         lambda bi, qi, p, nq=nq: (bi, p * nq + qi, 0)),
            pl.BlockSpec((1, bq, n_taps * n_heads),
                         lambda bi, qi, p, nq=nq: (bi, p * nq + qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, md),
                               lambda bi, qi, p: (bi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, q_pad, md), out_dtype),
        scratch_shapes=[pltpu.VMEM((bq, acc_cols), jnp.float32)],
    )(taps, w)


def _call_one(kern, taps, w, q_pad, bq, n_points, tmd, n_taps, n_heads, md,
              out_dtype, acc_cols):
    nq = q_pad // bq
    return pl.pallas_call(
        kern,
        grid=(nq, n_points),
        in_specs=[
            pl.BlockSpec((bq, tmd), lambda qi, p: (p * nq + qi, 0)),
            pl.BlockSpec((bq, n_taps * n_heads), lambda qi, p: (p * nq + qi, 0)),
        ],
        out_specs=pl.BlockSpec((bq, md), lambda qi, p: (qi, 0)),
        out_shape=jax.ShapeDtypeStruct((q_pad, md), out_dtype),
        scratch_shapes=[pltpu.VMEM((bq, acc_cols), jnp.float32)],
    )(taps, w)


def _fwd(taps, w, n_points, n_heads, d, block_q=0):
    return _weight_taps_fwd_impl(taps, w, n_points, n_heads, d,
                                 block_q), (taps, w)


def _bwd(n_points, n_heads, d, block_q, res, g):
    taps, w = res
    b, pq, tmd = taps.shape
    q = pq // n_points
    t = tmd // (n_heads * d)
    g = g.astype(jnp.float32)                       # (B, Q, M*D)
    g5 = g.reshape(b, 1, q, 1, n_heads, d)
    w6 = w.reshape(b, n_points, q, t, n_heads, 1).astype(jnp.float32)
    gt = jnp.broadcast_to(g5 * w6, (b, n_points, q, t, n_heads, d))
    taps6 = taps.reshape(b, n_points, q, t, n_heads, d).astype(jnp.float32)
    gw = (taps6 * g5).sum(axis=-1)                  # (B, P, Q, T, M)
    return (gt.reshape(taps.shape).astype(taps.dtype),
            gw.reshape(w.shape).astype(w.dtype))


weight_taps.defvjp(_fwd, _bwd)
