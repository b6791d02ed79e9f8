"""Pallas TPU kernel for reference-exact multi-scale deformable sampling.

The packed2x2 XLA engine (ops/ms_deform_attn.py) is floored by XLA's gather
unit: ~7 ns per gathered ROW regardless of width — 12.4 M rows/img at 1024px
is ~85 ms, 20x off the HBM speed-of-light for the bytes actually moved
(~3 GB/img in bf16). This kernel replaces the gather+weighting for one level
with a Mosaic program that keeps the whole per-head 2x2-patch table resident
in VMEM and issues per-row dynamic-slice loads from it, folding the bilinear
tap weighting and the per-query point sum into the same pass (the XLA path
additionally pays ~30-40 ms/img of relayout copies around its weighting; see
PERFORMANCE.md).

Semantics are IDENTICAL to `ms_deform_attn` (reference per-head sampling
locations, ops/modules/ms_deform_attn.py:106-112 + the CUDA im2col
ms_deform_im2col_cuda.cuh:242-305): the wrapper computes the same base
indices and folded weights; only the gather/reduce execution differs, so
checkpoints trained with packed2x2 run unchanged (`TPU.MSDA_KERNEL pallas`).

Layout per (batch, head, level):
  table (R, 4*D)   R=(H+1)*(W+1) zero-padded 2x2 patches, one row per base
  idx   (P*QB,)    int32 row index per point, point-major within a Q block
  w     (P*QB, 4)  bilinear*validity*attention weight per tap
  out   (QB, D)    sum over taps and points

The kernel's inner loop is the row fetch: an unrolled fori_loop of dynamic
sublane slices VMEM->VMEM. Mosaic cannot lower vector gathers (jnp.take
inside a kernel fails to compile on this backend, rounds 1-3), but scalar
dynamic slices it can; with the table in VMEM each load is a few cycles
instead of the gather unit's ~6.4. Weighting runs on lane-aligned slices
(D=32) with an fp32 accumulator.

Forward kernel with a custom VJP whose backward recomputes through the XLA
engine (training defaults to the XLA path; the kernel is the inference
fast path for checkpoint-compatible serving).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-level VMEM budget for the patch table (bytes). The table is
# double-buffered by the pipeline; 5.5 MB covers 1024px level-0 (R=16641,
# 4*D=128, bf16 = 4.26 MB) with room for the rows scratch and weight blocks.
_TABLE_VMEM_BUDGET = 5_500_000


def _kernel(idx_ref, sub_ref, w_ref, table_ref, o_ref, rows_ref, *,
            blkp: int, qb: int, n_points: int, d: int, unroll: int,
            variant: str = "select"):
    """Gather rows via tile loads + one-hot MXU selection.

    Mosaic cannot prove alignment for dynamic SUBLANE offsets, so the table
    is shaped (R/8, 8, 128): the dynamic index lands on the untiled leading
    dim (tile-granular addresses, no alignment proof needed). Each step
    loads `unroll` tiles (8 candidate rows each), stacks them to a
    (8*unroll, 128) operand and selects the wanted row of every tile with a
    one-hot (unroll, 8*unroll) matmul — the MXU does the row extraction the
    VPU has no cheap primitive for. idx8 = row//8 (SMEM, scalar load
    indices); sub = row%8 (VMEM, vectorized one-hot construction).
    """
    if variant == "mxu":
        nsel = 8 * unroll
        iota = jax.lax.broadcasted_iota(jnp.int32, (unroll, nsel), 1)
        koff = jax.lax.broadcasted_iota(jnp.int32, (unroll, 1), 0) * 8

        def body(i, carry):
            base = i * unroll
            tiles = [table_ref[0, idx_ref[0, 0, base + k] // 8]
                     for k in range(unroll)]
            T = jnp.concatenate(tiles, axis=0)          # (nsel, 128)
            sub = sub_ref[0, pl.ds(base, unroll), :]    # (unroll, 1)
            onehot = (sub + koff == iota).astype(T.dtype)
            rows = jax.lax.dot_general(
                onehot, T, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # (unroll, 128) f32
            rows_ref[pl.ds(base, unroll), :] = rows
            return carry

        jax.lax.fori_loop(0, blkp // unroll, body, 0)
    else:  # "select": per point, aligned tile load + mask + sublane-reduce
        # + masked placement — VPU-only ops Mosaic is known to lower
        # (dynamic sublane rotates crash this backend's compile helper; the
        # mxu variant streams 8 candidate rows per point through the
        # contraction and floors at ~8 cycles/point).
        sublane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

        def body(i, carry):
            base = i * 8
            acc = jnp.zeros((8, 128), jnp.float32)
            for k in range(8):
                r = idx_ref[0, 0, base + k]
                tile = table_ref[0, r // 8].astype(jnp.float32)  # (8, 128)
                picked = jnp.where(sublane == r % 8, tile, 0.0)
                rowvec = jnp.sum(picked, axis=0, keepdims=True)  # (1, 128)
                acc = acc + jnp.where(sublane == k, rowvec, 0.0)
            rows_ref[pl.ds(base, 8), :] = acc
            return carry

        # Mosaic's in-kernel fori_loop only lowers unroll=1 or full unroll
        jax.lax.fori_loop(0, blkp // 8, body, 0,
                          unroll=(blkp // 8) if unroll >= 16 else 1)

    rows = rows_ref[...]
    w = w_ref[0]
    acc = None
    for t in range(4):
        term = rows[:, t * d:(t + 1) * d] * w[:, t:t + 1].astype(jnp.float32)
        acc = term if acc is None else acc + term
    o_ref[0] = acc.reshape(n_points, qb, d).sum(axis=0).astype(o_ref.dtype)


def _level_supported(H: int, W: int, P: int, D: int, dtype) -> bool:
    if P != 4 or 4 * D != 128:
        return False
    rows = (H + 1) * (W + 1)
    return rows * 4 * D * jnp.dtype(dtype).itemsize <= _TABLE_VMEM_BUDGET


def msda_pallas_supported(spatial_shapes, n_points: int, d_per_head: int,
                          dtype) -> bool:
    """True if EVERY level fits the kernel (otherwise the caller should use
    the XLA engine; mixing engines across levels is allowed but pointless)."""
    return all(_level_supported(h, w, n_points, d_per_head, dtype)
               for h, w in spatial_shapes)


def _gather_weight_level(table, idx, w, Q: int, *, qb: int = 512,
                         unroll: int = 16, variant: str = "select",
                         interpret: bool = False):
    """table (G, R, 4D), idx (G, Q, P) int32 in [0, R), w (G, Q, P, 4).
    Returns (G, Q, D) = sum_p sum_t table[idx][tD:(t+1)D] * w[..., t]."""
    G, R, lanes = table.shape
    D = lanes // 4
    P = idx.shape[-1]
    qpad = -(-Q // qb) * qb
    if qpad != Q:
        idx = jnp.pad(idx, ((0, 0), (0, qpad - Q), (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, qpad - Q), (0, 0), (0, 0)))
    nqb = qpad // qb
    blkp = P * qb
    r8 = -(-R // 8)
    if r8 * 8 != R:
        table = jnp.pad(table, ((0, 0), (0, r8 * 8 - R), (0, 0)))
    table = table.reshape(G, r8, 8, lanes)
    # point-major within each Q block: position p*qb + q_local. The index
    # block lives in SMEM; Mosaic requires the last two block dims to be
    # divisible by (8, 128) or EQUAL to the array dims, so the per-block
    # index slice is reshaped to (G*nqb, 1, blkp) and blocked (1, 1, blkp).
    idx_pm = (idx.reshape(G, nqb, qb, P).transpose(0, 1, 3, 2)
              .reshape(G * nqb, 1, blkp))
    w_pm = (w.reshape(G, nqb, qb, P, 4).transpose(0, 1, 3, 2, 4)
            .reshape(G, nqb * blkp, 4))

    out = pl.pallas_call(
        functools.partial(_kernel, blkp=blkp, qb=qb, n_points=P, d=D,
                          unroll=unroll, variant=variant),
        grid=(G, nqb),
        in_specs=[
            pl.BlockSpec((1, 1, blkp), lambda g, j, nqb=nqb: (g * nqb + j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, blkp, 1), lambda g, j, nqb=nqb: (g * nqb + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blkp, 4), lambda g, j: (g, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r8, 8, lanes), lambda g, j: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qb, D), lambda g, j: (g, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, qpad, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((blkp, lanes), jnp.float32)],
        interpret=interpret,
    )(idx_pm, idx_pm.reshape(G * nqb, blkp, 1) % 8, w_pm, table)
    return out[:, :Q]


def _msda_pallas_impl(value, sampling_locations, attention_weights,
                      spatial_shapes, interpret=False):
    B, S, M, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    sizes = [h * w for h, w in spatial_shapes]
    offsets = np.cumsum([0] + sizes)
    compute_dtype = jnp.promote_types(value.dtype, jnp.float32)
    out = jnp.zeros((B, M, Q, D), dtype=jnp.float32)

    for lid, (H, W) in enumerate(spatial_shapes):
        v = jax.lax.dynamic_slice_in_dim(value, int(offsets[lid]),
                                         sizes[lid], axis=1)
        v = jnp.swapaxes(v, 1, 2).reshape(B, M, H, W, D)
        vpad = jnp.pad(v, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        patch = jnp.concatenate(
            [vpad[:, :, :-1, :-1], vpad[:, :, :-1, 1:],
             vpad[:, :, 1:, :-1], vpad[:, :, 1:, 1:]], axis=-1)
        patch = patch.reshape(B * M, (H + 1) * (W + 1), 4 * D)

        loc = sampling_locations[:, :, :, lid]  # (B, Q, M, P, 2)
        aw = attention_weights[:, :, :, lid]    # (B, Q, M, P)
        fx = loc[..., 0].astype(compute_dtype) * W - 0.5
        fy = loc[..., 1].astype(compute_dtype) * H - 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        tx = fx - x0
        ty = fy - y0
        bx = jnp.clip(x0 + 1, 0, W).astype(jnp.int32)
        by = jnp.clip(y0 + 1, 0, H).astype(jnp.int32)
        idx = by * (W + 1) + bx                 # (B, Q, M, P)
        pvalid = ((x0 >= -1) & (x0 <= W - 1)
                  & (y0 >= -1) & (y0 <= H - 1)).astype(compute_dtype)
        tw = jnp.stack([(1 - tx) * (1 - ty), tx * (1 - ty),
                        (1 - tx) * ty, tx * ty], axis=-1)
        tw = tw * (pvalid * aw.astype(compute_dtype))[..., None]

        idx_g = idx.transpose(0, 2, 1, 3).reshape(B * M, Q, P)
        w_g = (tw.transpose(0, 2, 1, 3, 4).reshape(B * M, Q, P, 4)
               .astype(value.dtype))
        lvl = _gather_weight_level(patch, idx_g, w_g, Q,
                                   interpret=interpret)
        out = out + lvl.reshape(B, M, Q, D)

    return jnp.swapaxes(out, 1, 2).reshape(B, Q, M * D).astype(value.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def ms_deform_attn_pallas(value, sampling_locations, attention_weights,
                          spatial_shapes: Tuple[Tuple[int, int], ...]):
    """Drop-in for `ms_deform_attn` (same args/semantics, per-head
    locations); Pallas gather/weighting on TPU, XLA elsewhere."""
    if jax.default_backend() != "tpu":
        from .ms_deform_attn import ms_deform_attn
        return ms_deform_attn(value, spatial_shapes, sampling_locations,
                              attention_weights)
    return _msda_pallas_impl(value, sampling_locations, attention_weights,
                             spatial_shapes)


def _fwd(value, sampling_locations, attention_weights, spatial_shapes):
    out = ms_deform_attn_pallas(value, sampling_locations,
                                attention_weights, spatial_shapes)
    return out, (value, sampling_locations, attention_weights)


def _bwd(spatial_shapes, res, g):
    from .ms_deform_attn import ms_deform_attn
    value, loc, attn = res
    _, vjp = jax.vjp(
        lambda v, l, a: ms_deform_attn(v, spatial_shapes, l, a),
        value, loc, attn)
    return vjp(g)


ms_deform_attn_pallas.defvjp(_fwd, _bwd)
