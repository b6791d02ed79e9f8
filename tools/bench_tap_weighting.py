#!/usr/bin/env python
"""Micro-benchmark of packed2x2 tap-weighting variants at real model shapes.

Round-5 profile of the ref-exact stream (PERFORMANCE.md): per image the
weighting pipeline around the 92.5 ms gather floor costs ~30 ms —
9.6 ms taps concat (3 levels -> one kernel input), 4.7 ms weights relayout
(minor-dim-4 transpose), 16.4 ms kernel (only 32 of 128 lanes busy).
This harness times the variants in isolation at the encoder layer's real
shapes (BM=8, Q=21504, P=4, D=32) so the winner ships.

Usage: python tools/bench_tap_weighting.py [--iters 20]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, args, iters):
    out = fn(*args)
    jax_block(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax_block(out)
    return (time.perf_counter() - t0) / iters * 1000


def jax_block(x):
    import jax
    for leaf in jax.tree.leaves(x):
        np.asarray(leaf[..., :1])  # host fetch = true sync on this backend


def bench_headshare(args):
    """The head-shared engine's single fused call: B=1, n_points=L*P=12,
    Q=21504, rows 4*M*D=1024 wide (set MPF_TAP_WEIGHTING_VARIANT to pick the
    kernel; block sweep finds the per-variant optimum)."""
    import jax.numpy as jnp

    from mp_former_tpu.ops.tap_weighting import (weight_taps,
                                                 weight_taps_reference)

    B, Q, LP, M, D = 1, 21504, 12, 8, 32
    rng = np.random.RandomState(0)
    taps = jnp.asarray(rng.rand(B, LP * Q, 4 * M * D).astype(np.float32),
                       jnp.bfloat16)
    w = jnp.asarray(rng.rand(B, LP * Q, 4 * M).astype(np.float32),
                    jnp.bfloat16)

    import jax

    best = None
    for bq in (0, 256, 512, 1024, 1536):
        @jax.jit
        def var_bq(taps, w, bq=bq):
            return weight_taps(taps, w, LP, M, D, block_q=bq)

        try:
            ms = timeit(var_bq, (taps, w), args.iters)
        except Exception as e:  # noqa: BLE001 — scoped-vmem OOM etc.
            print(f"headshare bq={bq:5d} : FAILED "
                  f"({type(e).__name__}: {str(e)[:80]})")
            continue
        print(f"headshare bq={bq:5d} : {ms:7.2f} ms/layer  "
              f"(x6 = {ms * 6:6.1f} ms/img)")
        if best is None or ms < best[1]:
            best = (bq, ms)
    if best:
        @jax.jit
        def var_best(taps, w, bq=best[0]):
            return weight_taps(taps, w, LP, M, D, block_q=bq)

        got = np.asarray(var_best(taps, w)).astype(np.float32)
        want = np.asarray(weight_taps_reference(
            taps, w, LP, M, D)).astype(np.float32)
        err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
        print(f"best bq {best[0]} ({best[1]:.2f} ms); "
              f"numerics vs XLA reference: rel err {err:.2e}")
        assert err < 5e-2, "kernel drift at winning block size"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--headshare", action="store_true",
                   help="bench the head-shared call shape instead "
                        "(B=1, n_heads=8, tmd=1024, one call for all "
                        "levels x points)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from mp_former_tpu.ops.tap_weighting import weight_taps

    if args.headshare:
        return bench_headshare(args)

    BM, Q, P, D = 8, 21504, 4, 32
    L = 3
    rng = np.random.RandomState(0)
    # per-level taps as the gathers emit them (BM, P*Q, 4D)
    taps_l = [jnp.asarray(rng.rand(BM, P * Q, 4 * D).astype(np.float32),
                          jnp.bfloat16) for _ in range(L)]
    w_l = [jnp.asarray(rng.rand(BM, P * Q, 4).astype(np.float32),
                       jnp.bfloat16) for _ in range(L)]
    w_l_f32 = [w.astype(jnp.float32) for w in w_l]

    # A. shipped path: concat 3 levels -> one kernel call (n_points = L*P)
    @jax.jit
    def var_concat(taps_l, w_l):
        taps = jnp.concatenate(taps_l, axis=1)
        w = jnp.concatenate(w_l, axis=1)
        return weight_taps(taps, w, L * P, 1, D)

    # B. per-level kernel calls, XLA-summed outputs (kills the 528 MB concat)
    @jax.jit
    def var_perlevel(taps_l, w_l):
        outs = [weight_taps(t, w, P, 1, D) for t, w in zip(taps_l, w_l)]
        return outs[0] + outs[1] + outs[2]

    ms_a = timeit(var_concat, (taps_l, w_l), args.iters)
    ms_b = timeit(var_perlevel, (taps_l, w_l), args.iters)
    print(f"A concat+kernel      : {ms_a:7.2f} ms/layer  "
          f"(x6 layers = {ms_a * 6:6.1f} ms/img)")
    print(f"B per-level kernels  : {ms_b:7.2f} ms/layer  (x6 = {ms_b * 6:6.1f})")

    # C. per-level with f32 weights (skips the producer-side astype)
    @jax.jit
    def var_perlevel_f32w(taps_l, w_l):
        outs = [weight_taps(t, w, P, 1, D) for t, w in zip(taps_l, w_l)]
        return outs[0] + outs[1] + outs[2]

    ms_c = timeit(var_perlevel_f32w, (taps_l, w_l_f32), args.iters)
    print(f"C per-level, f32 w   : {ms_c:7.2f} ms/layer  (x6 = {ms_c * 6:6.1f})")

    # E. block-size sweep on the per-level form (per-grid-step overhead at
    # 1024-row blocks measured the kernel 4x off HBM bandwidth); variants
    # that exceed Mosaic's scoped-vmem limit are reported and skipped
    best = None
    for bq in (1024, 1536, 2688, 3584, 5376):
        @jax.jit
        def var_bq(taps_l, w_l, bq=bq):
            outs = [weight_taps(t, w, P, 1, D, block_q=bq)
                    for t, w in zip(taps_l, w_l)]
            return outs[0] + outs[1] + outs[2]

        try:
            ms = timeit(var_bq, (taps_l, w_l), args.iters)
        except Exception as e:  # noqa: BLE001 — scoped-vmem OOM etc.
            print(f"E per-level bq={bq:5d} : FAILED "
                  f"({type(e).__name__}: {str(e)[:80]})")
            continue
        print(f"E per-level bq={bq:5d} : {ms:7.2f} ms/layer  (x6 = {ms * 6:6.1f})")
        if best is None or ms < best[1]:
            best = (bq, ms)
    if best:
        print(f"best block_q: {best[0]} ({best[1]:.2f} ms/layer)")

    # numerics: per-level kernel == XLA reference at the winning block
    ref = var_xla_out = None
    if best:
        @jax.jit
        def var_best(taps_l, w_l, bq=best[0]):
            outs = [weight_taps(t, w, P, 1, D, block_q=bq)
                    for t, w in zip(taps_l, w_l)]
            return outs[0] + outs[1] + outs[2]

        from mp_former_tpu.ops.tap_weighting import weight_taps_reference

        got = np.asarray(var_best(taps_l, w_l)).astype(np.float32)
        want = sum(np.asarray(weight_taps_reference(t, w, P, 1, D))
                   .astype(np.float32) for t, w in zip(taps_l, w_l))
        err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
        print(f"numerics vs XLA reference: rel err {err:.2e}")
        assert err < 5e-2, "kernel drift at winning block size"

    # D. XLA reference reduction (what the kernel replaced), for context
    from mp_former_tpu.ops.tap_weighting import weight_taps_reference

    @jax.jit
    def var_xla(taps_l, w_l):
        taps = jnp.concatenate(taps_l, axis=1)
        w = jnp.concatenate(w_l, axis=1)
        return weight_taps_reference(taps, w, L * P, 1, D)

    ms_d = timeit(var_xla, (taps_l, w_l), args.iters)
    print(f"D XLA reduction      : {ms_d:7.2f} ms/layer  (x6 = {ms_d * 6:6.1f})")


if __name__ == "__main__":
    main()
