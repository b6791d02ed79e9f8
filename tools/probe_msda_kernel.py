"""Chip microbench for the Pallas MSDA gather kernel (ops/msda_pallas.py).

Measures the kernel at the real 1024px encoder shapes (level 0: 128x128,
Q=21504, M=8, P=4, D=32 -> 2.75M rows per level-0 call) across unroll
factors, against the XLA packed2x2 gather+weighting for the same level.
Also probes whether this backend's Mosaic can lower an in-kernel vector
gather (jnp.take) — rounds 1-3 it could not.

Usage: python tools/probe_msda_kernel.py [--size 1024] [--iters 20]
"""

import argparse
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mp_former_tpu.ops import msda_pallas as mp  # noqa: E402


def timed(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        r = fn(*args)
    jax.tree.map(lambda x: np.asarray(x[..., 0]) if hasattr(x, "shape") else x, r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    # host-fetch sync: block_until_ready acks early on this backend
    jax.tree.map(lambda x: np.asarray(x[..., :1]), r)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    H = W = args.size // 8
    Q = (args.size // 8) ** 2 + (args.size // 16) ** 2 + (args.size // 32) ** 2
    M, D, P = 8, 32, 4
    G = M  # B=1
    R = (H + 1) * (W + 1)
    dtype = jnp.dtype(args.dtype)
    rows_total = G * Q * P
    print(f"level0 {H}x{W} R={R} Q={Q} rows/call={rows_total/1e6:.2f}M "
          f"table={R*128*dtype.itemsize/1e6:.1f}MB {dtype}")

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (G, R, 4 * D), jnp.float32).astype(dtype)
    idx = jax.random.randint(jax.random.PRNGKey(1), (G, Q, P), 0, R,
                             dtype=jnp.int32)
    w = jax.random.uniform(jax.random.PRNGKey(2), (G, Q, P, 4)).astype(dtype)

    # --- XLA baseline: the packed2x2 gather + weighting at this level shape
    @jax.jit
    def xla_level(table, idx, w):
        taps = jnp.take_along_axis(
            table, idx.reshape(G, Q * P, 1), axis=1,
            mode="promise_in_bounds")            # (G, QP, 4D)
        wt = taps.reshape(G, Q * P, 4, D) * w.reshape(G, Q * P, 4, 1)
        return wt.sum(axis=2).reshape(G, Q, P, D).sum(axis=2)

    t = timed(xla_level, table, idx, w, iters=args.iters)
    print(f"XLA gather+weight: {t*1e3:8.2f} ms  {t/rows_total*1e9:6.2f} ns/row")

    # --- Pallas kernel across variants/unrolls
    for variant, unrolls in (("select", (8, 16)),
                             ("mxu", (32, 64))):
        for unroll in unrolls:
            fn = jax.jit(functools.partial(
                mp._gather_weight_level, Q=Q, qb=512, unroll=unroll,
                variant=variant))
            try:
                t = timed(fn, table, idx, w, iters=args.iters)
                print(f"pallas {variant} unroll={unroll}: {t*1e3:8.2f} ms  "
                      f"{t/rows_total*1e9:6.2f} ns/row")
            except Exception as e:  # noqa: BLE001
                print(f"pallas {variant} unroll={unroll}: FAIL "
                      f"{type(e).__name__}: {str(e)[:300]}")

    # --- correctness on chip (vs XLA) for the default config
    got = jax.jit(functools.partial(mp._gather_weight_level, Q=Q))(
        table, idx, w)
    ref = xla_level(table, idx, w)
    err = np.abs(np.asarray(got, np.float32)
                 - np.asarray(ref, np.float32)).max()
    print(f"max abs err vs XLA: {err:.3e}")

    # --- probe: can Mosaic lower an in-kernel vector gather now?
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def take_kernel(idx_ref, table_ref, o_ref):
        o_ref[...] = jnp.take(table_ref[...], idx_ref[...], axis=0)

    try:
        fn = pl.pallas_call(
            take_kernel,
            out_shape=jax.ShapeDtypeStruct((1024, 128), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = jax.jit(fn)(idx[0, :256, :].reshape(1024), table[0])
        out.block_until_ready()
        t = timed(jax.jit(fn), idx[0, :256, :].reshape(1024), table[0],
                  iters=args.iters)
        print(f"in-kernel jnp.take WORKS: {t*1e6:.1f} us / 1024 rows")
    except Exception as e:  # noqa: BLE001
        print(f"in-kernel jnp.take: FAIL {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
