"""Single-chip inference throughput for ANY config (bench.py generalized;
bench.py remains the driver-facing flagship R50 headline).

Usage:
  python tools/benchmark_infer.py --config-file configs/coco/instance-segmentation/swin/maskformer2_swin_large_IN21k_384_bs16_100ep.yaml \
      [--size 1024] [--batch 1] [--iters 10] [KEY VALUE ...]

Measures the jitted eval forward with host-fetch synchronization (on this
remote TPU backend block_until_ready acks before execution; fetching scalar
reductions is the only honest sync — PERFORMANCE.md). Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# make the CPU backend available for fast param init
_plat = os.environ.get("JAX_PLATFORMS")
if _plat and "cpu" not in _plat:
    os.environ["JAX_PLATFORMS"] = _plat + ",cpu"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp
    from mp_former_tpu.config import (add_deeplab_config, add_maskformer2_config,
                                      get_cfg)
    from mp_former_tpu.models import build_model

    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    model = build_model(cfg)

    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.rand(args.batch, args.size, args.size, 3).astype(np.float32) * 255)
    small = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = jax.jit(
        lambda k, im: model.init({"params": k}, im, None, train=False)
    )(jax.random.PRNGKey(0), small)

    @jax.jit
    def fwd(p, im):
        out = model.apply(p, im, None, train=False)
        return jnp.sum(out["pred_logits"]), jnp.sum(
            out["pred_masks"][:, :, ::64, ::64])

    a, b = fwd(params, images)
    float(a), float(b)

    best_dt = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        sums = [fwd(params, images) for _ in range(args.iters)]
        for a, b in sums:
            float(a), float(b)
        best_dt = min(best_dt, time.perf_counter() - t0)

    img_per_sec = args.batch * args.iters / best_dt
    print(json.dumps({
        "config": os.path.basename(args.config_file),
        "size": args.size,
        "batch": args.batch,
        "img_per_sec": round(img_per_sec, 3),
        "ms_per_img": round(1000.0 * best_dt / (args.batch * args.iters), 2),
    }))


if __name__ == "__main__":
    main()
