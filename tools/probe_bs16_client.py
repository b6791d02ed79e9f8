#!/usr/bin/env python
"""Fine-grained probe of the runtime-client failure at bs16@1024 accum-8.

Round-3/4 symptom ladder (PERFORMANCE.md round 4): the monolithic step
aborts the client on its 2nd execution; split-step moves the failure to
the update program's 2nd call; per-iteration syncs let 4 steps finish but
a later fetch still dies. This probe runs N synced steps with explicit
logging around every dispatch/fetch to localize the first failing
operation, then checks whether the device is still usable afterwards.

Usage: python tools/probe_bs16_client.py [--iters 6] [opts...]
"""

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--instances", type=int, default=40)
    p.add_argument("--gt-stride", type=int, default=1,
                   help="build GT masks at size//stride (the train loaders "
                        "ship 1/4-canvas masks in grid mode)")
    p.add_argument("--uint8", action="store_true",
                   help="ship images as uint8 (the compact-transfer "
                        "loader layout)")
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
    cfg.merge_from_list(args.opts or [])
    model = build_model(cfg)
    criterion = build_criterion(cfg)

    b, s, n = args.batch, args.size, args.instances
    ms = s // args.gt_stride
    rng = np.random.RandomState(0)
    masks = np.zeros((b, n, ms, ms), bool)
    masks[:, :10, ms // 8: ms // 2, ms // 8: ms // 2] = True
    imgs = (rng.rand(b, s, s, 3) * 255)
    batch = Batch(
        images=jnp.asarray(imgs.astype(np.uint8) if args.uint8
                           else imgs.astype(np.float32)),
        targets=Targets(
            labels=jnp.asarray(rng.randint(0, 80, (b, n)), jnp.int32),
            masks=jnp.asarray(masks),
            boxes=jnp.asarray(rng.rand(b, n, 4), jnp.float32),
            valid=jnp.asarray(np.tile([True] * 10 + [False] * (n - 10),
                                      (b, 1)))))
    log("batch on device")
    params = jax.jit(lambda k, i, t: model.init(
        {"params": k, "dn": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, i, t, train=True))(
        jax.random.PRNGKey(0), batch.images, batch.targets)["params"]
    jax.tree.map(lambda x: x.block_until_ready(), params)
    log("params initialized")
    tx = build_optimizer(cfg, params)
    state = create_train_state(params, tx)
    step = make_train_step(model, criterion, tx,
                           donate=bool(int(os.environ.get("PROBE_DONATE",
                                                          "1"))),
                           accum=int(cfg.TPU.GRAD_ACCUM_STEPS or 1),
                           split=bool(cfg.TPU.SPLIT_STEP),
                           host_accum=bool(cfg.TPU.HOST_ACCUM))

    keys = [jax.random.PRNGKey(100 + k) for k in range(args.iters)]
    log("prngkeys made")
    ok = 0
    for k in range(args.iters):
        try:
            t0 = time.perf_counter()
            state, metrics = step(state, batch, keys[k])
            log(f"iter {k}: dispatched ({time.perf_counter() - t0:.2f}s)")
            t0 = time.perf_counter()
            loss = float(metrics["total_loss"])
            log(f"iter {k}: loss {loss:.3f} synced "
                f"({time.perf_counter() - t0:.2f}s)")
            try:
                ms = jax.local_devices()[0].memory_stats() or {}
                log(f"iter {k}: hbm in_use="
                    f"{ms.get('bytes_in_use', -1) / 1e9:.2f}G peak="
                    f"{ms.get('peak_bytes_in_use', -1) / 1e9:.2f}G")
            except Exception:  # noqa: BLE001
                pass
            ok += 1
        except Exception:
            log(f"iter {k}: FAILED")
            traceback.print_exc()
            break
    log(f"{ok}/{args.iters} steps completed")

    # is the device still usable?
    for name, fn in [
        ("tiny transfer", lambda: float(jnp.asarray(np.float32(3.5)))),
        ("tiny compute", lambda: float(jnp.sum(jnp.ones((8, 8))))),
        ("param fetch", lambda: float(
            np.asarray(jax.tree.leaves(state.params)[0]).ravel()[0])),
    ]:
        try:
            fn()
            log(f"post-check {name}: OK")
        except Exception as e:  # noqa: BLE001
            log(f"post-check {name}: FAILED ({type(e).__name__})")


if __name__ == "__main__":
    main()
