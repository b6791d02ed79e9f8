#!/usr/bin/env python
"""Experiment: point-major slice-add weighting fused into the XLA gather.

The Pallas weighting kernel reads the 176 MB/level-layer taps tensor the
gathers wrote (round-5 profile: 92.5 ms gathers + 17.4 ms kernel + 6 ms
copies). If the weighted 4-tap reduction is expressed as elementwise
multiply + 3 slice-adds in the taps' native point-major layout, XLA can
fuse it INTO the gather fusion — the materialized output shrinks to
(BM, PQ, D) = 44 MB and the kernel + its copies disappear. Round 1-2
measured XLA formulations only in the q-major layout, where every variant
relayouts.

Monkeypatches the packed2x2 core and benches the ref-exact stream.

Usage: python tools/bench_xla_fused_weighting.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def ms_deform_attn_pm_sliceadd(value, spatial_shapes, sampling_locations,
                               attention_weights, pallas_weighting=False):
    import jax
    import jax.numpy as jnp

    B, S, M, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    sizes = [h * w for h, w in spatial_shapes]
    offsets = np.cumsum([0] + sizes)
    out = jnp.zeros((B, Q, M, D), dtype=value.dtype)
    compute_dtype = jnp.promote_types(value.dtype, jnp.float32)

    for lid, (H, W) in enumerate(spatial_shapes):
        v = jax.lax.dynamic_slice_in_dim(value, int(offsets[lid]),
                                         sizes[lid], axis=1)
        v = jnp.swapaxes(v, 1, 2).reshape(B, M, H, W, D)
        vpad = jnp.pad(v, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        patch = jnp.concatenate(
            [vpad[:, :, :-1, :-1], vpad[:, :, :-1, 1:],
             vpad[:, :, 1:, :-1], vpad[:, :, 1:, 1:]], axis=-1)
        patch = patch.reshape(B, M, (H + 1) * (W + 1), 4 * D)

        loc = sampling_locations[:, :, :, lid].transpose(0, 2, 3, 1, 4)
        w = attention_weights[:, :, :, lid].transpose(0, 2, 3, 1)
        fx = loc[..., 0].astype(compute_dtype) * W - 0.5
        fy = loc[..., 1].astype(compute_dtype) * H - 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        tx = fx - x0
        ty = fy - y0
        bx = jnp.clip(x0 + 1, 0, W).astype(jnp.int32)
        by = jnp.clip(y0 + 1, 0, H).astype(jnp.int32)
        idx = by * (W + 1) + bx                        # (B, M, P, Q)
        pvalid = ((x0 >= -1) & (x0 <= W - 1)
                  & (y0 >= -1) & (y0 <= H - 1)).astype(compute_dtype)
        w00 = (1 - tx) * (1 - ty) * pvalid
        w01 = tx * (1 - ty) * pvalid
        w10 = (1 - tx) * ty * pvalid
        w11 = tx * ty * pvalid
        wp = w.astype(compute_dtype)

        taps = jnp.take_along_axis(
            patch.reshape(B * M, (H + 1) * (W + 1), 4 * D),
            idx.reshape(B * M, P * Q, 1), axis=1,
            mode="promise_in_bounds")                  # (BM, PQ, 4D)
        td = taps.dtype
        tw = [(c * wp).reshape(B * M, P * Q, 1).astype(td)
              for c in (w00, w01, w10, w11)]
        # elementwise in the gather row's native layout -> fuses into the
        # gather; materialized output is (BM, PQ, D)
        s = (taps[..., 0 * D:1 * D] * tw[0]
             + taps[..., 1 * D:2 * D] * tw[1]
             + taps[..., 2 * D:3 * D] * tw[2]
             + taps[..., 3 * D:4 * D] * tw[3])
        sampled = s.reshape(B, M, P, Q, D).sum(axis=2)  # (B, M, Q, D)
        out = out + jnp.swapaxes(sampled, 1, 2).astype(value.dtype)

    return out.reshape(B, Q, M * D)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp

    import mp_former_tpu.ops.ms_deform_attn as m

    # correctness vs the shipped core at small shape first
    rng = np.random.RandomState(0)
    shapes = ((16, 16), (8, 8), (4, 4))
    B, M, D, P, Q = 1, 8, 32, 4, 336
    S = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.rand(B, S, M, D).astype(np.float32))
    locs = jnp.asarray(rng.rand(B, Q, M, 3, P, 2).astype(np.float32))
    attn = jnp.asarray(rng.rand(B, Q, M, 3, P).astype(np.float32))
    # the shipped core's 4-tap 0/1-stack einsum runs at DEFAULT MXU
    # precision on TPU (bf16 passes, ~7e-3 abs at these magnitudes); pin it
    # to fp32 so the comparison measures the variant, not the oracle
    with jax.default_matmul_precision("float32"):
        want = np.asarray(m.ms_deform_attn(value, shapes, locs, attn))
    got = np.asarray(ms_deform_attn_pm_sliceadd(value, shapes, locs, attn))
    err = np.abs(got - want).max()
    print(f"correctness vs shipped core (fp32 oracle): max abs err {err:.2e}")
    assert err < 1e-4

    # end-to-end ref-exact stream with the variant patched in
    m.ms_deform_attn = ms_deform_attn_pm_sliceadd
    import bench
    ips, _ = bench._measure_engine(["TPU.COMPUTE_DTYPE", "bfloat16"])
    print(f"ref_exact with XLA point-major slice-add: {ips:.2f} img/s")


if __name__ == "__main__":
    main()
