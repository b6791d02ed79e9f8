"""Profile the flagship eval forward on the TPU and print per-op-category
HLO timings aggregated from the trace (the only reliable profiling tool on
this backend — see PERFORMANCE.md).

Usage: JAX_PLATFORMS=axon python tools/profile_forward.py [--dtype bfloat16]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--out", default="/tmp/prof_fwd")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--stream", type=int, default=0,
                    help="profile the bench-style lax.scan stream of K "
                         "images (0 = single invocation)")
    ap.add_argument("opts", nargs=argparse.REMAINDER, default=None,
                    help="extra config KEY VALUE overrides")
    args = ap.parse_args()

    from mp_former_tpu.models import build_model
    from __graft_entry__ import _flagship_cfg

    cfg = _flagship_cfg()
    cfg.merge_from_list(["TPU.COMPUTE_DTYPE", args.dtype]
                        + (args.opts or []))
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    small = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = jax.jit(
        lambda k, im: model.init({"params": k}, im, None, train=False)
    )(jax.random.PRNGKey(0), small)

    if args.stream:
        images = jnp.asarray(
            rng.rand(args.stream, 1, args.size, args.size, 3)
            .astype(np.float32) * 255)

        @jax.jit
        def fwd(p, ims):
            def body(_, im):
                out = model.apply(p, im, None, train=False)
                return (), (jnp.sum(out["pred_logits"]),
                            jnp.sum(out["pred_masks"][:, :, ::64, ::64]))
            _, (a, b) = jax.lax.scan(body, (), ims)
            return jnp.sum(a), jnp.sum(b)
    else:
        images = jnp.asarray(
            rng.rand(1, args.size, args.size, 3).astype(np.float32) * 255)

        @jax.jit
        def fwd(p, im):
            out = model.apply(p, im, None, train=False)
            return jnp.sum(out["pred_logits"]), jnp.sum(
                out["pred_masks"][:, :, ::64, ::64])

    a, b = fwd(params, images)
    float(a), float(b)

    n_calls = 1 if args.stream else 3
    t0 = time.perf_counter()
    with jax.profiler.trace(args.out):
        for _ in range(n_calls):
            a, b = fwd(params, images)
            float(a), float(b)
    wall = (time.perf_counter() - t0) / n_calls / max(args.stream, 1)

    # aggregate XLA op events from the trace
    paths = sorted(glob.glob(
        os.path.join(args.out, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("dur")]
    # the device process (metadata '/device:TPU:*') has an XLA-ops lane with
    # one event per HLO execution; pick its busiest thread by event count
    dev_pids = {e["pid"] for e in trace["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "device" in str(e.get("args", {}).get("name", ""))}
    lanes = defaultdict(list)
    for e in events:
        if e.get("pid") in dev_pids:
            lanes[(e.get("pid"), e.get("tid"))].append(e)
    xla_lane = max(lanes.values(), key=len)
    total = sum(e["dur"] for e in xla_lane)

    by_name = defaultdict(float)
    for e in xla_lane:
        name = e.get("name", "?")
        # strip trailing .N indices to group repeats of the same fusion
        base = name.rstrip("0123456789.")
        by_name[base] += e["dur"]

    denom = n_calls * max(args.stream, 1)  # ms per image either way
    print(f"wall/img: {wall * 1000:.1f} ms; "
          f"XLA lane busy: {total / denom / 1000:.1f} ms/img "
          f"({len(xla_lane)} events over {n_calls} calls)")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {dur / denom / 1000:8.2f} ms/img  {name[:100]}")


if __name__ == "__main__":
    main()
