"""Multi-scale deformable attention — TPU-native.

Replaces the reference's CUDA extension (reference
ops/src/cuda/ms_deform_im2col_cuda.cuh:242-305 forward, :306-927 backward) and
its pure-torch fallback `ms_deform_attn_core_pytorch`
(ops/functions/ms_deform_attn_func.py:52-72).

Design (TPU-first): each (batch, head) gathers L*P bilinear samples per
query. TPU gathers are ROW-COUNT-bound (~6.8 ns/row measured on v5e,
independent of row width and table size — see PERFORMANCE.md), so the four
bilinear taps of every sample point are packed into ONE gather row via a 2x2
patch table (4D = 128 floats = exactly one lane row). This quarters the
gather count vs the naive 4-tap form and measured 2.9x end-to-end. Autodiff
produces the scatter-add backward — no atomics (the CUDA backward needs 6
atomic-reduction kernel variants; XLA's scatter-add is deterministic).

The semantics (coordinate convention, zero padding, align_corners=False) are
pinned to the reference fallback by tests/test_ms_deform_attn.py, the port of
reference ops/test.py.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def ms_deform_attn(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
    pallas_weighting: bool = False,
) -> jax.Array:
    """Functional multi-scale deformable attention (XLA).

    value:               (B, S, M, D)  — S = sum of H_l*W_l over levels
    spatial_shapes:      static list of (H_l, W_l)
    sampling_locations:  (B, Q, M, L, P, 2) in [0, 1], (x, y) order
    attention_weights:   (B, Q, M, L, P), softmax-normalized over L*P
    returns              (B, Q, M*D)
    """
    B, S, M, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)

    # split value per level
    sizes = [h * w for h, w in spatial_shapes]
    offsets = np.cumsum([0] + sizes)
    out = jnp.zeros((B, Q, M, D), dtype=value.dtype)
    compute_dtype = jnp.promote_types(value.dtype, jnp.float32)
    # pallas weighting path: point-major taps/weights per (level, layer) feed
    # a batched weight_taps call (n_heads=1, batch=B*M) — every XLA
    # formulation of the post-gather reduce relayouts the taps tensor
    # (~30-40 ms/img at 1024px, PERFORMANCE.md); the kernel streams them once

    for lid, (H, W) in enumerate(spatial_shapes):
        v = jax.lax.dynamic_slice_in_dim(value, int(offsets[lid]), sizes[lid], axis=1)
        # (B, H*W, M, D) -> (B, M, H, W, D)
        v = jnp.swapaxes(v, 1, 2).reshape(B, M, H, W, D)
        # 2x2 patch table on a zero-padded map: one gather of a 4D-wide row
        # fetches all four bilinear taps (TPU gathers are row-granular, so
        # this cuts gather count 4x and fills the 128-lane row exactly when
        # D=32). vpad[a, b] = v[a-1, b-1]; patch[y, x] = taps of base (y-1, x-1).
        vpad = jnp.pad(v, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        patch = jnp.concatenate(
            [vpad[:, :, :-1, :-1], vpad[:, :, :-1, 1:],
             vpad[:, :, 1:, :-1], vpad[:, :, 1:, 1:]], axis=-1)
        patch = patch.reshape(B, M, (H + 1) * (W + 1), 4 * D)

        loc = sampling_locations[:, :, :, lid]  # (B, Q, M, P, 2)
        w = attention_weights[:, :, :, lid]     # (B, Q, M, P)
        if pallas_weighting:
            # point-major axes up front: the index/weight math below is
            # elementwise (axis-agnostic), and with (B, M, P, Q) producers
            # the kernel's idx/weight operands reshape for free instead of
            # relayouting minor-dim-4 tensors (4.7 ms/img at 1024px,
            # round-5 profile)
            loc = loc.transpose(0, 2, 3, 1, 4)  # (B, M, P, Q, 2)
            w = w.transpose(0, 2, 3, 1)         # (B, M, P, Q)
        # grid_sample convention: grid = 2*loc - 1; align_corners=False:
        # pixel coord = (grid+1)/2 * size - 0.5 = loc * size - 0.5
        fx = loc[..., 0].astype(compute_dtype) * W - 0.5
        fy = loc[..., 1].astype(compute_dtype) * H - 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        tx = fx - x0
        ty = fy - y0

        bx = jnp.clip(x0 + 1, 0, W).astype(jnp.int32)
        by = jnp.clip(y0 + 1, 0, H).astype(jnp.int32)
        idx = by * (W + 1) + bx                         # (B, Q, M, P)

        # if the patch base is unclipped (x0 in [-1, W-1], y0 in [-1, H-1]),
        # every tap either reads a real pixel or the zero padding — exactly
        # grid_sample's zero-padding semantics. A clipped base means all
        # in-range taps would read the zero border anyway, so zero the point.
        pvalid = ((x0 >= -1) & (x0 <= W - 1)
                  & (y0 >= -1) & (y0 <= H - 1)).astype(compute_dtype)
        w00 = (1 - tx) * (1 - ty) * pvalid
        w01 = tx * (1 - ty) * pvalid
        w10 = (1 - tx) * ty * pvalid
        w11 = tx * ty * pvalid
        tw = jnp.stack([w00, w01, w10, w11], axis=-1)   # (B, Q, M, P, 4)
        # fold the per-point attention weight into the bilinear tap weights so
        # the whole reduction happens in the gather row's native layout
        tw = tw * w[..., None].astype(compute_dtype)

        if pallas_weighting:
            # point-major rows per (b, m); ONE kernel call per level — the
            # levels-concatenated form materializes a 528 MB/layer kernel
            # input (round-5 profile: 9.6 ms/img of pad/concat) while the
            # per-level calls read each gather output directly and the
            # (B, Q, M*D) partial sums add for free. idx/tw are already
            # (B, M, P, Q[, 4]) here, so these reshapes are layout-free.
            from .tap_weighting import weight_taps

            idx_pm = idx.reshape(B * M, P * Q, 1)       # (BM, P*Q, 1)
            taps = jnp.take_along_axis(
                patch.reshape(B * M, (H + 1) * (W + 1), 4 * D), idx_pm,
                axis=1, mode="promise_in_bounds")       # (BM, P*Q, 4D)
            w_pm = tw.reshape(B * M, P * Q, 4)
            sampled = weight_taps(taps, w_pm.astype(taps.dtype),
                                  P, 1, D)              # (BM, Q, D)
            out = out + jnp.swapaxes(
                sampled.reshape(B, M, Q, D), 1, 2).astype(value.dtype)
            continue

        idx = jnp.swapaxes(idx, 1, 2).reshape(B, M, Q * P, 1)
        taps = jnp.take_along_axis(
            patch, idx, axis=2, mode="promise_in_bounds")  # (B, M, Q*P, 4D)
        tw = jnp.swapaxes(tw, 1, 2).reshape(B, M, Q * P, 4).astype(taps.dtype)

        # weight taps elementwise in the packed (..., 4D) layout, then reduce
        # the 4 taps with a 0/1 block-stacking matmul: keeping the 4D minor
        # dimension intact avoids the relayout copies XLA emits for a
        # (..., 4, D) einsum reduction (~2 ms/layer at 1024px, see
        # PERFORMANCE.md)
        wtaps = taps * jnp.repeat(tw, D, axis=-1)       # (B, M, Q*P, 4D)
        stack = jnp.tile(jnp.eye(D, dtype=taps.dtype), (4, 1))  # (4D, D)
        sampled = jnp.einsum("bmnk,kd->bmnd", wtaps, stack)
        out = out + jnp.swapaxes(
            sampled.reshape(B, M, Q, P, D).sum(axis=3), 1, 2).astype(value.dtype)

    return out.reshape(B, Q, M * D)


def ms_deform_attn_headshare(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
    pallas_weighting: bool = False,
) -> jax.Array:
    """Head-shared deformable sampling (TPU-optimized engine).

    All heads sample at the SAME locations (one (q, l, p) location set per
    query instead of one per head); attention weights stay per-head. One
    gather row then carries the 2x2 taps of every head (4*M*D wide), cutting
    the gather ROW count M-fold — the op is row-count-bound on TPU (~7 ns/row
    in-model regardless of width/dtype, see PERFORMANCE.md), so this is the
    main throughput lever. A semantic deviation from the reference (per-head
    locations, ops/modules/ms_deform_attn.py:106-112): models must be trained
    with it (`TPU.SAMPLING_ENGINE headshare`); checkpoints do not interconvert.

    value:               (B, S, M, D)
    sampling_locations:  (B, Q, L, P, 2) in [0, 1] — shared across heads
    attention_weights:   (B, Q, M, L, P), softmax-normalized over L*P
    returns              (B, Q, M*D)
    """
    B, S, M, D = value.shape
    _, Q, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)
    sizes = [h * w for h, w in spatial_shapes]
    offsets = np.cumsum([0] + sizes)
    out = jnp.zeros((B, Q, M, D), dtype=value.dtype)
    compute_dtype = jnp.promote_types(value.dtype, jnp.float32)
    # pallas path: per-(level, layer) weight_taps calls — the gather outputs
    # feed the kernel directly and the (B, Q, M, D) partial sums add for
    # free. The levels-fused single call per layer (grid-step accumulator
    # absorbing the level sum) concatenates ~534 MB/layer of taps first; the
    # round-2 A/B preferred it under the slices kernel's 0.4 ms launch
    # overhead, but with the fullane kernel the per-level form measures
    # faster end-to-end (round-5 on-chip A/B) — matching the packed2x2
    # engine's round-5 result. MPF_HEADSHARE_FUSED_LEVELS=1 restores the
    # fused form for A/Bs. (Concatenating the patch TABLES into a single
    # gather was measured slower still: the 44 MB table concat is a real
    # copy.)
    import os as _os
    fuse_levels = _os.environ.get("MPF_HEADSHARE_FUSED_LEVELS", "0") == "1"
    fused_taps, fused_w = [], []

    for lid, (H, W) in enumerate(spatial_shapes):
        v = jax.lax.dynamic_slice_in_dim(value, int(offsets[lid]), sizes[lid], axis=1)
        v = v.reshape(B, H, W, M * D)
        vpad = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
        # packed row layout: (tap, head, channel) major-to-minor
        patch = jnp.concatenate(
            [vpad[:, :-1, :-1], vpad[:, :-1, 1:],
             vpad[:, 1:, :-1], vpad[:, 1:, 1:]], axis=-1)
        patch = patch.reshape(B, (H + 1) * (W + 1), 4 * M * D)

        loc = sampling_locations[:, :, lid]  # (B, Q, P, 2)
        w = attention_weights[:, :, :, lid]  # (B, Q, M, P)
        fx = loc[..., 0].astype(compute_dtype) * W - 0.5
        fy = loc[..., 1].astype(compute_dtype) * H - 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        tx = fx - x0
        ty = fy - y0
        bx = jnp.clip(x0 + 1, 0, W).astype(jnp.int32)
        by = jnp.clip(y0 + 1, 0, H).astype(jnp.int32)
        idx = (by * (W + 1) + bx)                        # (B, Q, P)

        pvalid = ((x0 >= -1) & (x0 <= W - 1)
                  & (y0 >= -1) & (y0 <= H - 1)).astype(compute_dtype)
        tw = jnp.stack([(1 - tx) * (1 - ty), tx * (1 - ty),
                        (1 - tx) * ty, tx * ty], axis=-1)  # (B, Q, P, 4)
        tw = tw * pvalid[..., None]
        # fold per-head attention: (B, Q, P, 4, M)
        full = tw[..., None] * jnp.swapaxes(w, 2, 3).astype(compute_dtype)[..., None, :]

        if pallas_weighting:
            # point-major rows; the fused VPU kernel streams the taps once
            idx_pm = jnp.swapaxes(idx, 1, 2).reshape(B, P * Q, 1)
            taps = jnp.take_along_axis(
                patch, idx_pm, axis=1, mode="promise_in_bounds")  # (B, P*Q, 4MD)
            w_pm = jnp.swapaxes(full, 1, 2).reshape(B, P * Q, 4 * M)
            if fuse_levels:
                fused_taps.append(taps)
                fused_w.append(w_pm.astype(taps.dtype))
            else:
                from .tap_weighting import weight_taps

                sampled = weight_taps(taps, w_pm.astype(taps.dtype), P, M, D)
                out = out + sampled.reshape(B, Q, M, D).astype(value.dtype)
        else:
            taps = jnp.take_along_axis(
                patch, idx.reshape(B, Q * P, 1), axis=1,
                mode="promise_in_bounds")  # (B, Q*P, 4MD)
            fl = full.reshape(B, Q * P, 4, M).astype(taps.dtype)
            # weight + reduce via layout-preserving splits of the gather row
            # (the best of the XLA formulations measured at 1024px — repeat +
            # 0/1-stack einsum, per-tap slice-adds, and batched-matvec einsums
            # all relayout the 44 MB taps tensor and measure the same or
            # worse; see PERFORMANCE.md round 2)
            wtaps = taps.reshape(B, Q * P, 4, M, D) * fl[..., None]
            sampled = wtaps.sum(axis=2).reshape(B, Q, P, M, D).sum(axis=2)
            out = out + sampled.astype(value.dtype)

    if fused_taps:
        from .tap_weighting import weight_taps

        taps_all = jnp.concatenate(fused_taps, axis=1)   # (B, L*P*Q, 4MD)
        w_all = jnp.concatenate(fused_w, axis=1)         # (B, L*P*Q, 4M)
        sampled = weight_taps(taps_all, w_all, L * P, M, D)
        out = out + sampled.reshape(B, Q, M, D).astype(value.dtype)

    return out.reshape(B, Q, M * D)


class MSDeformAttn(nn.Module):
    """Deformable-attention module (reference ops/modules/ms_deform_attn.py:34-125).

    Linear heads produce per-query sampling offsets (bias initialized to a
    per-head rotated grid, reference `_reset_parameters` :66-80) and softmax
    attention weights over levels*points; the gather core is `ms_deform_attn`.
    """

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    # 'packed2x2' = reference-exact per-head locations; 'pallas' = identical
    # semantics/params via the Mosaic gather kernel (ops/msda_pallas.py —
    # reference checkpoints load unchanged); 'headshare' = one location set
    # shared by all heads (TPU.SAMPLING_ENGINE; see ms_deform_attn_headshare;
    # headshare checkpoints do not interconvert).
    sampling_engine: str = "packed2x2"
    # fuse the headshare tap weighting into a Pallas VPU kernel (TPU only;
    # falls back to XLA on other backends). TPU.PALLAS_TAP_WEIGHTING.
    pallas_weighting: bool = False
    dtype: jnp.dtype = jnp.float32

    def _offset_bias_init(self, key, shape, dtype=jnp.float32):
        # per-head unit vectors on a compass rose, scaled by point index
        thetas = np.arange(self.n_heads, dtype=np.float64) * (2.0 * math.pi / self.n_heads)
        grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (M, 2)
        grid = grid / np.abs(grid).max(-1, keepdims=True)
        grid = np.tile(grid[:, None, None, :], (1, self.n_levels, self.n_points, 1))
        for i in range(self.n_points):
            grid[:, :, i, :] *= i + 1
        return jnp.asarray(grid.reshape(-1), dtype=dtype)

    def _offset_bias_init_shared(self, key, shape, dtype=jnp.float32):
        # head-shared variant: spread the P points over a compass rose with
        # growing radius (the per-head diversity of the reference init moves
        # into the per-point directions)
        thetas = np.arange(self.n_points, dtype=np.float64) * (2.0 * math.pi / self.n_points)
        grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (P, 2)
        grid = grid / np.abs(grid).max(-1, keepdims=True)
        grid = np.tile(grid[None, :, :], (self.n_levels, 1, 1))
        for i in range(self.n_points):
            grid[:, i, :] *= i + 1
        return jnp.asarray(grid.reshape(-1), dtype=dtype)

    @nn.compact
    def __call__(
        self,
        query: jax.Array,                 # (B, Q, C)
        reference_points: jax.Array,      # (B, Q, L, 2) in [0,1]
        input_flatten: jax.Array,         # (B, S, C)
        spatial_shapes: Sequence[Tuple[int, int]],  # static
        input_padding_mask: jax.Array | None = None,  # (B, S) True=pad
    ) -> jax.Array:
        B, Q, C = query.shape
        _, S, _ = input_flatten.shape
        M, L, P = self.n_heads, self.n_levels, self.n_points
        D = self.d_model // M

        value = nn.Dense(self.d_model, dtype=self.dtype,
                         kernel_init=nn.initializers.xavier_uniform(),
                         name="value_proj")(input_flatten)
        if input_padding_mask is not None:
            value = jnp.where(input_padding_mask[..., None], 0.0, value)
        value = value.reshape(B, S, M, D)

        headshare = self.sampling_engine == "headshare"
        offsets = nn.Dense(
            (1 if headshare else M) * L * P * 2, dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=(self._offset_bias_init_shared if headshare
                       else self._offset_bias_init),
            name="sampling_offsets",
        )(query)
        attn = nn.Dense(
            M * L * P, dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(query).reshape(B, Q, M, L * P)
        attn = jax.nn.softmax(attn, axis=-1).reshape(B, Q, M, L, P)

        # normalize offsets by (W, H) per level (reference :106-112)
        normalizer = jnp.asarray(
            [[w, h] for h, w in spatial_shapes], dtype=offsets.dtype
        )  # (L, 2) in (x, y) order
        if headshare:
            offsets = offsets.reshape(B, Q, L, P, 2)
            if reference_points.shape[-1] == 2:
                loc = (reference_points[:, :, :, None, :]
                       + offsets / normalizer[None, None, :, None, :])
            elif reference_points.shape[-1] == 4:
                loc = (reference_points[:, :, :, None, :2]
                       + offsets / P * reference_points[:, :, :, None, 2:] * 0.5)
            else:
                raise ValueError("reference_points last dim must be 2 or 4")
            out = ms_deform_attn_headshare(
                value, spatial_shapes, loc, attn,
                pallas_weighting=self.pallas_weighting)
            return nn.Dense(self.d_model, dtype=self.dtype,
                            kernel_init=nn.initializers.xavier_uniform(),
                            name="output_proj")(out)

        offsets = offsets.reshape(B, Q, M, L, P, 2)
        if reference_points.shape[-1] == 2:
            loc = (
                reference_points[:, :, None, :, None, :]
                + offsets / normalizer[None, None, None, :, None, :]
            )
        elif reference_points.shape[-1] == 4:
            loc = (
                reference_points[:, :, None, :, None, :2]
                + offsets / P * reference_points[:, :, None, :, None, 2:] * 0.5
            )
        else:
            raise ValueError("reference_points last dim must be 2 or 4")

        if self.sampling_engine == "pallas":
            from .msda_pallas import (ms_deform_attn_pallas,
                                      msda_pallas_supported)
            if msda_pallas_supported(spatial_shapes, P, D, value.dtype):
                out = ms_deform_attn_pallas(value, loc, attn,
                                            tuple(spatial_shapes))
            else:
                out = ms_deform_attn(value, spatial_shapes, loc, attn,
                                     pallas_weighting=self.pallas_weighting)
        else:
            out = ms_deform_attn(value, spatial_shapes, loc, attn,
                                 pallas_weighting=self.pallas_weighting)
        return nn.Dense(self.d_model, dtype=self.dtype,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name="output_proj")(out)
