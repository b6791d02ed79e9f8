#!/usr/bin/env python
"""DN compile churn under NUM_DN >= 100 budgets (VERDICT round-4 weak #8).

The reference treats NUM_DN >= 100 as a total-query budget and derives the
DN group count from the BATCH max GT count every iteration
(mask2former_transformer_decoder.py:973-974). Under jit both numbers are
static shapes, so every distinct (groups, batch_max) pair compiles a new
step program. This tool quantifies that churn on GT-count-diverse data:

  1. simulate 3000 iterations of batch-max GT over a realistic COCO-like
     per-image instance-count distribution (lognormal, median ~6, clipped
     to [1, 40] — COCO val2017 has mean 7.3 / p99 ~35), for B=8 and B=16,
     and count the distinct compiled programs at TPU.DN_GROUP_BUCKET
     1 / 2 / 4 / 8;
  2. optionally (--time-compile, needs the chip) compile the real flagship
     NUM_DN=100 train step at two distinct batch-max values and report the
     marginal seconds per extra program.

distinct_programs x seconds_per_compile is the wall-clock cost the bucket
default is traded against; the decision lands in PARITY.md.

Usage: python tools/measure_dn_compile_churn.py [--iters 3000]
       [--time-compile] [--json OUT.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def coco_like_counts(rng, n):
    """Per-image GT instance counts with a COCO-like spread: lognormal
    (median ~6, heavy right tail), clipped to [1, 40]."""
    c = rng.lognormal(mean=1.8, sigma=0.9, size=n)
    return np.clip(np.round(c), 1, 40).astype(int)


def simulate(iters, batch, bucket, scalar=100, seed=0):
    """-> (distinct (groups, max) programs, first-seen iteration of each)."""
    from mp_former_tpu.engine.train_step import compute_dn_groups

    rng = np.random.RandomState(seed)
    seen = {}
    for it in range(iters):
        counts = coco_like_counts(rng, batch)
        # valid mask shaped (B, cap) with counts[i] True slots
        cap = 40
        valid = np.arange(cap)[None, :] < counts[:, None]
        key = compute_dn_groups(scalar, valid, bucket=bucket)
        if key not in seen:
            seen[key] = it
    return seen


def time_compiles():
    """Compile the real flagship NUM_DN=100 step at two batch-max values on
    the current backend; return marginal seconds for the second program."""
    import time

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from mp_former_tpu.engine.optimizer import build_optimizer
    from mp_former_tpu.engine.train_step import (Batch, create_train_state,
                                                 make_train_step)
    from mp_former_tpu.models import build_model
    from mp_former_tpu.models.criterion import build_criterion
    from mp_former_tpu.structures import Targets

    cfg = _flagship_cfg()
    cfg.merge_from_list([
        "MODEL.DN.NUM_DN", "100",
        "TPU.COMPUTE_DTYPE", "bfloat16",
        "TPU.PALLAS_TAP_WEIGHTING", "True",
    ])
    model = build_model(cfg)
    criterion = build_criterion(cfg)
    b, s, n = 8, 512, 40
    rng = np.random.RandomState(0)
    masks = np.zeros((b, n, s, s), bool)
    masks[:, :, s // 8: s // 2, s // 8: s // 2] = True
    batch = Batch(
        images=jnp.asarray(rng.rand(b, s, s, 3).astype(np.float32) * 255),
        targets=Targets(
            labels=jnp.asarray(rng.randint(0, 80, (b, n)), jnp.int32),
            masks=jnp.asarray(masks),
            boxes=jnp.asarray(rng.rand(b, n, 4), jnp.float32),
            valid=jnp.asarray(np.ones((b, n), bool))))
    params = jax.jit(lambda k, i, t: model.init(
        {"params": k, "dn": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, i, t, train=True))(
        jax.random.PRNGKey(0), batch.images, batch.targets)["params"]
    jax.tree.map(lambda x: x.block_until_ready(), params)
    tx = build_optimizer(cfg, params)
    state = create_train_state(params, tx)
    step = make_train_step(model, criterion, tx, donate=False)

    times = []
    for groups in [(10, 10), (5, 20)]:  # two distinct static (groups, max)
        t0 = time.perf_counter()
        _, metrics = step(state, batch, jax.random.PRNGKey(3),
                          dn_groups=groups)
        float(metrics["total_loss"])
        times.append(time.perf_counter() - t0)
        print(f"# dn_groups={groups}: first-call (compile+exec) "
              f"{times[-1]:.1f}s", file=sys.stderr)
    return times


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=3000)
    p.add_argument("--time-compile", action="store_true")
    p.add_argument("--json", default="")
    args = p.parse_args()

    out = {"iters": args.iters, "sweep": []}
    print("| B | bucket | distinct programs | last new program at iter |")
    print("|---|---|---|---|")
    for batch in (8, 16):
        for bucket in (1, 2, 4, 8):
            seen = simulate(args.iters, batch, bucket)
            last = max(seen.values())
            out["sweep"].append({"batch": batch, "bucket": bucket,
                                 "distinct": len(seen), "last_new_iter": last,
                                 "programs": sorted(map(list, seen))})
            print(f"| {batch} | {bucket} | {len(seen)} | {last} |")

    if args.time_compile:
        times = time_compiles()
        out["compile_seconds_per_program"] = times
        print(f"# marginal compile time for a 2nd program: {times[1]:.1f}s")

    line = json.dumps(out)
    if args.json:
        with open(args.json, "w") as f:
            f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
