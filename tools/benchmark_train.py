#!/usr/bin/env python
"""Training-step throughput benchmark on the current backend.

Usage: python tools/benchmark_train.py [--batch 2] [--size 512] [--iters 5]
       [opts ...]

Prints one JSON line {metric, value, unit} (train images/sec/chip). Uses
host-fetch synchronization (remote TPU backends ack dispatches early).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--instances", type=int, default=100)
    p.add_argument("--config", default="",
                   help="optional config yaml merged over the flagship "
                        "recipe (e.g. a Swin backbone config)")
    p.add_argument("--donate", action="store_true",
                   help="donate train-state buffers (the Trainer default); "
                        "safe here because the reused batch is never "
                        "donated")
    p.add_argument("--sync", action="store_true",
                   help="fetch the loss every iteration (bounds dispatch "
                        "queue depth to one in-flight step)")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_cfg
    from mp_former_tpu.engine.optimizer import build_optimizer
    from mp_former_tpu.engine.train_step import (Batch, create_train_state,
                                                 make_train_step)
    from mp_former_tpu.models import build_model
    from mp_former_tpu.models.criterion import build_criterion
    from mp_former_tpu.structures import Targets

    cfg = _flagship_cfg()
    if args.config:
        cfg.merge_from_file(args.config)
    cfg.merge_from_list(args.opts or [])
    model = build_model(cfg)
    criterion = build_criterion(cfg)

    b, s, n = args.batch, args.size, args.instances
    rng = np.random.RandomState(0)
    masks = np.zeros((b, n, s, s), bool)
    masks[:, :10, s // 8: s // 2, s // 8: s // 2] = True
    batch = Batch(
        images=jnp.asarray(rng.rand(b, s, s, 3).astype(np.float32) * 255),
        targets=Targets(
            labels=jnp.asarray(rng.randint(0, 80, (b, n)), jnp.int32),
            masks=jnp.asarray(masks),
            boxes=jnp.asarray(rng.rand(b, n, 4), jnp.float32),
            valid=jnp.asarray(np.tile([True] * 10 + [False] * (n - 10), (b, 1)))))
    params = jax.jit(lambda k, i, t: model.init(
        {"params": k, "dn": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, i, t, train=True))(
        jax.random.PRNGKey(0), batch.images, batch.targets)["params"]
    jax.tree.map(lambda x: x.block_until_ready(), params)
    tx = build_optimizer(cfg, params)
    state = create_train_state(params, tx)
    step = make_train_step(model, criterion, tx, donate=args.donate,
                           accum=int(cfg.TPU.GRAD_ACCUM_STEPS or 1),
                           split=bool(cfg.TPU.SPLIT_STEP),
                           host_accum=bool(cfg.TPU.HOST_ACCUM))

    state, metrics = step(state, batch, jax.random.PRNGKey(3))
    float(metrics["total_loss"])  # sync (compile + first exec)

    t0 = time.perf_counter()
    for k in range(args.iters):
        state, metrics = step(state, batch, jax.random.PRNGKey(4 + k))
        if args.sync:
            float(metrics["total_loss"])
    float(metrics["total_loss"])
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({
        "metric": f"train_images_per_sec_b{b}_{s}px",
        "value": round(b / dt, 3),
        "unit": "img/s",
        "step_ms": round(dt * 1000, 1),
        "final_loss": round(float(metrics["total_loss"]), 2),
    }))


if __name__ == "__main__":
    main()
