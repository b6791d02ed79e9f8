"""Microbenchmark: candidate deformable-attention sampling engines on TPU.

Shapes model one encoder layer of the flagship R50 config at 1024px eval:
levels (128,128),(64,64),(32,32), Q=21504 queries, M=8 heads, P=4 points,
D=32 head dim. The full forward runs 6 such layers; PERFORMANCE.md shows the
end-to-end time is dominated by these gathers (85 of 191 ms), so per-layer
wins translate ~directly.

Engines:
  packed2x2   — current default: one 4D-wide row per (q, m, l, p)   [12.4M rows/img]
  headshare   — locations shared across heads: one 4*M*D row per (q, l, p) [/8 rows]
  headpair    — locations shared across head pairs: 8D rows          [/2 rows]
  superrow6   — 6x6 patch row per (q, m, l): 36D-wide                [/4 rows]
  pallas_dma  — per-row DMA pipeline gather (feasibility probe)
  mosaic_take — jnp.take inside a Pallas kernel (remote-compiler probe)

Timing: host-fetch sync (block_until_ready lies on this backend), slope
method (time n_hi and n_lo scan lengths, divide the difference) to cancel
the ~28 ms dispatch floor.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# the axon site hook ignores JAX_PLATFORMS at import time; re-apply from env
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

SPATIAL = [(128, 128), (64, 64), (32, 32)]
Q = sum(h * w for h, w in SPATIAL)
M, P, D = 8, 4, 32
B = 1


def _rand(rng, shape, dtype):
    return jnp.asarray(rng.rand(*shape).astype(np.float32)).astype(dtype)


def make_inputs(rng, dtype):
    S = sum(h * w for h, w in SPATIAL)
    value = _rand(rng, (B, S, M, D), dtype)
    loc = _rand(rng, (B, Q, M, len(SPATIAL), P, 2), jnp.float32)
    attn = jax.nn.softmax(
        _rand(rng, (B, Q, M, len(SPATIAL) * P), jnp.float32), -1
    ).reshape(B, Q, M, len(SPATIAL), P).astype(dtype)
    return value, loc, attn


# --------------------------------------------------------------------------
# engine: packed2x2 (mirror of ops/ms_deform_attn.ms_deform_attn)
def eng_packed2x2(value, loc, attn):
    from mp_former_tpu.ops.ms_deform_attn import ms_deform_attn
    return ms_deform_attn(value, SPATIAL, loc, attn)


# --------------------------------------------------------------------------
# engine: headshare — one gather row carries the 2x2 taps of ALL heads.
# Locations are taken from head 0 (a co-trained model would produce a single
# head-shared offset/loc tensor; compute cost is identical).
def eng_headshare(value, loc, attn):
    Bv, S, Mv, Dv = value.shape
    _, Qv, _, L, Pv, _ = loc.shape
    out = jnp.zeros((Bv, Qv, Mv, Dv), value.dtype)
    offsets = np.cumsum([0] + [h * w for h, w in SPATIAL])
    cd = jnp.float32
    for lid, (H, W) in enumerate(SPATIAL):
        v = jax.lax.dynamic_slice_in_dim(value, int(offsets[lid]), H * W, 1)
        v = v.reshape(Bv, H, W, Mv * Dv)
        vpad = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
        patch = jnp.concatenate(
            [vpad[:, :-1, :-1], vpad[:, :-1, 1:],
             vpad[:, 1:, :-1], vpad[:, 1:, 1:]], -1)
        patch = patch.reshape(Bv, (H + 1) * (W + 1), 4 * Mv * Dv)

        l0 = loc[:, :, 0, lid]          # (B, Q, P, 2) — head-0 locations
        w = attn[:, :, :, lid]          # (B, Q, M, P)
        fx = l0[..., 0].astype(cd) * W - 0.5
        fy = l0[..., 1].astype(cd) * H - 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        tx, ty = fx - x0, fy - y0
        bx = jnp.clip(x0 + 1, 0, W).astype(jnp.int32)
        by = jnp.clip(y0 + 1, 0, H).astype(jnp.int32)
        idx = (by * (W + 1) + bx).reshape(Bv, Qv * Pv, 1)
        taps = jnp.take_along_axis(patch, idx, axis=1)  # (B, Q*P, 4MD)

        pv = ((x0 >= -1) & (x0 <= W - 1) & (y0 >= -1) & (y0 <= H - 1)).astype(cd)
        tw = jnp.stack([(1 - tx) * (1 - ty), tx * (1 - ty),
                        (1 - tx) * ty, tx * ty], -1) * pv[..., None]  # (B,Q,P,4)
        # fold per-head attention: (B,Q,P,4) x (B,Q,M,P) -> (B,Q,P,4,M)
        full = tw[..., None] * jnp.swapaxes(w, 2, 3).astype(cd)[..., None, :]
        full = full.reshape(Bv, Qv * Pv, 4 * Mv).astype(taps.dtype)
        wtaps = taps * jnp.repeat(full, Dv, -1)
        stack = jnp.tile(jnp.eye(Mv * Dv, dtype=taps.dtype), (4, 1))
        sampled = jnp.einsum("bnk,kd->bnd", wtaps, stack)
        out = out + sampled.reshape(Bv, Qv, Pv, Mv, Dv).sum(2).astype(value.dtype)
    return out.reshape(Bv, Qv, Mv * Dv)


# --------------------------------------------------------------------------
# engine: headpair — like headshare but only pairs of heads share a location.
def eng_headpair(value, loc, attn):
    Bv, S, Mv, Dv = value.shape
    G = Mv // 2  # location groups
    v2 = value.reshape(Bv, S, G, 2 * Dv)
    l2 = loc[:, :, ::2]          # (B, Q, G, L, P, 2)
    a2 = attn.reshape(attn.shape[0], attn.shape[1], G, 2, *attn.shape[3:])
    out = jnp.zeros((Bv, Q, G, 2 * Dv), value.dtype)
    offsets = np.cumsum([0] + [h * w for h, w in SPATIAL])
    cd = jnp.float32
    for lid, (H, W) in enumerate(SPATIAL):
        v = jax.lax.dynamic_slice_in_dim(v2, int(offsets[lid]), H * W, 1)
        v = jnp.swapaxes(v, 1, 2).reshape(Bv, G, H, W, 2 * Dv)
        vpad = jnp.pad(v, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        patch = jnp.concatenate(
            [vpad[:, :, :-1, :-1], vpad[:, :, :-1, 1:],
             vpad[:, :, 1:, :-1], vpad[:, :, 1:, 1:]], -1)
        patch = patch.reshape(Bv, G, (H + 1) * (W + 1), 8 * Dv)
        l0 = l2[:, :, :, lid]      # (B, Q, G, P, 2)
        w = a2[:, :, :, :, lid]    # (B, Q, G, 2, P)
        fx = l0[..., 0].astype(cd) * W - 0.5
        fy = l0[..., 1].astype(cd) * H - 0.5
        x0, y0 = jnp.floor(fx), jnp.floor(fy)
        tx, ty = fx - x0, fy - y0
        bx = jnp.clip(x0 + 1, 0, W).astype(jnp.int32)
        by = jnp.clip(y0 + 1, 0, H).astype(jnp.int32)
        idx = (by * (W + 1) + bx)                    # (B, Q, G, P)
        idx = jnp.swapaxes(idx, 1, 2).reshape(Bv, G, Q * P, 1)
        taps = jnp.take_along_axis(patch, idx, axis=2)  # (B, G, Q*P, 8D)
        pv = ((x0 >= -1) & (x0 <= W - 1) & (y0 >= -1) & (y0 <= H - 1)).astype(cd)
        tw = jnp.stack([(1 - tx) * (1 - ty), tx * (1 - ty),
                        (1 - tx) * ty, tx * ty], -1) * pv[..., None]  # (B,Q,G,P,4)
        full = tw[..., None] * jnp.moveaxis(w, 3, -1).astype(cd)[..., None, :]
        full = jnp.swapaxes(full, 1, 2).reshape(Bv, G, Q * P, 8).astype(taps.dtype)
        wtaps = taps * jnp.repeat(full, Dv, -1)
        stack = jnp.tile(jnp.eye(2 * Dv, dtype=taps.dtype), (4, 1))
        sampled = jnp.einsum("bgnk,kd->bgnd", wtaps, stack)
        out = out + jnp.swapaxes(
            sampled.reshape(Bv, G, Q, P, 2 * Dv).sum(3), 1, 2).astype(value.dtype)
    return out.reshape(Bv, Q, Mv * Dv)


# --------------------------------------------------------------------------
# engine: superrow6 — one 6x6-patch row per (q, m, l); the 4 points of that
# (query, head, level) are clamped into the window around their mean.
def eng_superrow6(value, loc, attn):
    K = 6
    Bv, S, Mv, Dv = value.shape
    _, Qv, _, L, Pv, _ = loc.shape
    out = jnp.zeros((Bv, Qv, Mv, Dv), value.dtype)
    offsets = np.cumsum([0] + [h * w for h, w in SPATIAL])
    cd = jnp.float32
    for lid, (H, W) in enumerate(SPATIAL):
        v = jax.lax.dynamic_slice_in_dim(value, int(offsets[lid]), H * W, 1)
        v = jnp.swapaxes(v, 1, 2).reshape(Bv, Mv, H, W, Dv)
        # K x K patch table: row r of the (H+1)*(W+1) grid holds the KxK
        # window whose top-left tap is (r_y - 1, r_x - 1)
        pad = K - 1
        vpad = jnp.pad(v, ((0, 0), (0, 0), (1, pad), (1, pad), (0, 0)))
        cols = []
        for dy in range(K):
            for dx in range(K):
                cols.append(vpad[:, :, dy:dy + H + 1, dx:dx + W + 1])
        patch = jnp.concatenate(cols, -1).reshape(
            Bv, Mv, (H + 1) * (W + 1), K * K * Dv)

        l0 = loc[:, :, :, lid]       # (B, Q, M, P, 2)
        w = attn[:, :, :, lid]       # (B, Q, M, P)
        fx = l0[..., 0].astype(cd) * W - 0.5
        fy = l0[..., 1].astype(cd) * H - 0.5
        cx = jnp.floor(fx.mean(-1)) - (K // 2 - 1)   # window top-left tap x
        cy = jnp.floor(fy.mean(-1)) - (K // 2 - 1)
        bx = jnp.clip(cx + 1, 0, W).astype(jnp.int32)
        by = jnp.clip(cy + 1, 0, H).astype(jnp.int32)
        idx = (by * (W + 1) + bx)                    # (B, Q, M)
        idx = jnp.swapaxes(idx, 1, 2).reshape(Bv, Mv, Qv, 1)
        rows = jnp.take_along_axis(patch, idx, 2)    # (B, M, Q, K*K*D)

        # clamp each point's taps into the window, build per-point KxK weights
        # (local coords are relative to the CLIPPED window base bx-1, by-1)
        cx = bx.astype(cd) - 1
        cy = by.astype(cd) - 1
        lx = jnp.clip(fx - cx[..., None], 0.0, K - 1.001)  # window-local coords
        ly = jnp.clip(fy - cy[..., None], 0.0, K - 1.001)
        x0 = jnp.floor(lx)
        y0 = jnp.floor(ly)
        tx, ty = lx - x0, ly - y0
        # one-hot KxK weight per point: (B,Q,M,P,K*K)
        gx = jax.nn.one_hot(x0.astype(jnp.int32), K, dtype=cd)
        gx1 = jax.nn.one_hot(x0.astype(jnp.int32) + 1, K, dtype=cd)
        gy = jax.nn.one_hot(y0.astype(jnp.int32), K, dtype=cd)
        gy1 = jax.nn.one_hot(y0.astype(jnp.int32) + 1, K, dtype=cd)
        wx = gx * (1 - tx[..., None]) + gx1 * tx[..., None]
        wy = gy * (1 - ty[..., None]) + gy1 * ty[..., None]
        kk = (wy[..., :, None] * wx[..., None, :]).reshape(*wx.shape[:-1], K * K)
        kk = (kk * w[..., None].astype(cd)).sum(3)   # (B, Q, M, K*K) over P
        kk = jnp.swapaxes(kk, 1, 2).astype(rows.dtype)  # (B, M, Q, K*K)
        wrows = rows * jnp.repeat(kk, Dv, -1)
        stack = jnp.tile(jnp.eye(Dv, dtype=rows.dtype), (K * K, 1))
        sampled = jnp.einsum("bmqk,kd->bmqd", wrows, stack)
        out = out + jnp.swapaxes(sampled, 1, 2).astype(value.dtype)
    return out.reshape(Bv, Qv, Mv * Dv)


ENGINES = {
    "packed2x2": eng_packed2x2,
    "headshare": eng_headshare,
    "headpair": eng_headpair,
    "superrow6": eng_superrow6,
}


def time_engine(name, fn, dtype, n_lo=2, n_hi=8, reps=3):
    rng = np.random.RandomState(0)
    value, loc, attn = make_inputs(rng, dtype)

    def scan_n(n):
        @jax.jit
        def run(value, loc, attn):
            def body(carry, _):
                # thread the carry into the input so XLA cannot hoist the
                # loop-invariant body out of the scan (CSE turns a constant
                # body into a single execution)
                v = value + carry.astype(value.dtype)
                o = fn(v, loc, attn)
                return carry + o[0, ::997, 0].astype(jnp.float32).sum() * 1e-20, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return c
        return run

    lo, hi = scan_n(n_lo), scan_n(n_hi)
    float(lo(value, loc, attn))  # compile
    float(hi(value, loc, attn))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(lo(value, loc, attn))
        t1 = time.perf_counter()
        float(hi(value, loc, attn))
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (n_hi - n_lo))
    per_layer = min(ts) * 1000
    print(f"{name:12s} {np.dtype(dtype).name:9s} {per_layer:8.2f} ms/layer "
          f"-> {6 * per_layer:7.1f} ms/img (6 layers)")
    return per_layer


def probe_mosaic_take():
    """Does a dynamic gather inside a Pallas kernel compile on this backend?"""
    from jax.experimental import pallas as pl

    def kernel(idx_ref, tab_ref, o_ref):
        o_ref[...] = jnp.take(tab_ref[...], idx_ref[...][:, 0], axis=0)

    tab = jnp.asarray(np.random.rand(256, 128).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, 256, (64, 1)).astype(np.int32))
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        )(idx, tab)
        err = float(jnp.abs(out - tab[idx[:, 0]]).max())
        print(f"mosaic_take: compiled and ran, max err {err:.2e}")
    except Exception as e:  # noqa: BLE001
        print(f"mosaic_take: FAILED — {type(e).__name__}: {str(e)[:200]}")


def probe_pallas_dma(n_rows=65536, width=128, slots=8):
    """Per-row DMA pipeline gather: table stays in HBM, each row is one
    make_async_copy; gathered rows are accumulated in VMEM (measures the
    DMA-issue-bound gather rate without materializing the output)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(idx_ref, tab_ref, o_ref, scratch, sems):
        def get(slot, i):
            return pltpu.make_async_copy(
                tab_ref.at[idx_ref[i]], scratch.at[slot], sems.at[slot])

        for s in range(slots):
            get(s, s).start()
        o_ref[...] = jnp.zeros_like(o_ref)

        def body(i, _):
            slot = jax.lax.rem(i, slots)
            pltpu.make_async_copy(
                tab_ref.at[idx_ref[i]], scratch.at[slot], sems.at[slot]).wait()
            o_ref[slot, :] += scratch[slot]

            @pl.when(i + slots < n_rows)
            def _():
                pltpu.make_async_copy(
                    tab_ref.at[idx_ref[i + slots]],
                    scratch.at[jax.lax.rem(i + slots, slots)],
                    sems.at[jax.lax.rem(i + slots, slots)]).start()
            return 0

        jax.lax.fori_loop(0, n_rows, body, 0)

    tab_np = np.random.rand(16641, width).astype(np.float32)
    idx_np = np.random.randint(0, 16641, (n_rows,)).astype(np.int32)
    tab = jnp.asarray(tab_np)
    idx = jnp.asarray(idx_np)
    try:
        call = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((slots, width), jnp.float32),
                    pltpu.SemaphoreType.DMA((slots,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((slots, width), jnp.float32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )

        @jax.jit
        def run(idx, tab):
            return call(idx, tab).sum()

        got = float(run(idx, tab))
        want = float(tab_np[idx_np].sum())
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(idx, tab))
            ts.append(time.perf_counter() - t0)
        ns_row = min(ts) / n_rows * 1e9
        print(f"pallas_dma: {ns_row:.1f} ns/row at {width} floats "
              f"({n_rows} rows; incl ~28 ms dispatch floor; "
              f"sum rel err {abs(got - want) / abs(want):.2e})")
    except Exception as e:  # noqa: BLE001
        print(f"pallas_dma: FAILED — {type(e).__name__}: {str(e)[:300]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--engines", default="packed2x2,headshare,headpair,superrow6")
    ap.add_argument("--dtypes", default="float32,bfloat16")
    ap.add_argument("--probes", default="")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}  Q={Q} M={M} P={P} D={D} levels={SPATIAL}")
    for name in [e for e in args.engines.split(",") if e]:
        for dt in args.dtypes.split(","):
            time_engine(name, ENGINES[name], jnp.dtype(dt))
    if "mosaic_take" in args.probes:
        probe_mosaic_take()
    if "pallas_dma" in args.probes:
        probe_pallas_dma()


if __name__ == "__main__":
    main()
