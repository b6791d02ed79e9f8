#!/usr/bin/env python
"""Auction-vs-scipy matcher agreement on REAL trained costs.

The on-device epsilon-scaling auction (ops/auction_lsa.py) replaces the
reference's host scipy hop (reference mask2former/modeling/matcher.py:149-151).
Unit tests bound its cost suboptimality at 1-5% on random/adversarial
matrices; this tool measures what that means on the cost matrices an actual
trained model produces: load a checkpoint, run the cost pass
(engine/train_step.py make_cost_step) over training batches, solve every
(Q, N) layer problem BOTH ways, and report

  - assignment agreement rate over valid GT columns,
  - relative matched-cost gap auction vs scipy (scipy is exact),
  - the share of problems solved identically.

Usage (chip or CPU):
  python tools/measure_matcher_agreement.py --config-file tools/ab_base_synthetic.yaml \
      --weights /tmp/ab_grid_baseline/checkpoints/3000 --batches 20 [KEY VALUE ...]

Prints one JSON line with the aggregates.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--weights", default="")
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    import numpy as np

    from mp_former_tpu.config import (add_deeplab_config,
                                      add_maskformer2_config, get_cfg)
    from mp_former_tpu.data.datasets import builtin  # noqa: F401 (registers)
    from mp_former_tpu.data.loader import build_train_loader
    from mp_former_tpu.engine.trainer import Trainer
    from mp_former_tpu.engine.train_step import make_cost_step
    from mp_former_tpu.models.matcher import _lsa_host, hungarian_assign

    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.MODEL.WEIGHTS = args.weights
    cfg.OUTPUT_DIR = "/tmp/matcher_agreement"
    cfg.freeze()

    loader = build_train_loader(cfg)
    trainer = Trainer(cfg, loader)
    if args.weights:
        trainer.resume_or_load(resume=False)
    cost_step = make_cost_step(trainer.model, trainer.criterion)

    assign_auction = jax.jit(
        lambda c, v: hungarian_assign(c, impl="auction", col_valid=v))

    it = iter(loader)
    n_problems = 0
    n_identical = 0
    col_total = 0
    col_agree = 0
    gaps = []
    with jax.set_mesh(trainer.mesh):
        for bi in range(args.batches):
            batch = next(it)
            sharded = trainer._shard_batch(batch)
            rng = jax.random.fold_in(trainer.rng, bi)
            costs = np.asarray(
                cost_step(trainer.state, sharded, rng))  # (L, B, Q, N)
            valid = np.asarray(batch.targets.valid)      # (B, N)
            l, b, q, n = costs.shape
            vtile = np.broadcast_to(valid[None], (l, b, n))
            auc = np.asarray(assign_auction(costs, vtile))   # (L, B, N)
            sci = _lsa_host(costs.reshape(l * b, q, n)).reshape(l, b, n)
            for li in range(l):
                for b_i in range(b):
                    v = valid[b_i]
                    if not v.any():
                        continue
                    c = costs[li, b_i]
                    a_sel = auc[li, b_i][v]
                    s_sel = sci[li, b_i][v]
                    cols = np.nonzero(v)[0]
                    a_cost = c[a_sel, cols].sum()
                    s_cost = c[s_sel, cols].sum()
                    denom = max(abs(s_cost), 1e-9)
                    gaps.append(float((a_cost - s_cost) / denom))
                    n_problems += 1
                    same = (a_sel == s_sel).all()
                    n_identical += bool(same)
                    col_total += len(cols)
                    col_agree += int((a_sel == s_sel).sum())

    gaps_arr = np.asarray(gaps) if gaps else np.zeros((1,))
    print(json.dumps({
        "metric": "matcher_agreement",
        "problems": n_problems,
        "identical_rate": round(n_identical / max(n_problems, 1), 4),
        "column_agreement": round(col_agree / max(col_total, 1), 4),
        "mean_cost_gap": round(float(gaps_arr.mean()), 6),
        "p99_cost_gap": round(float(np.percentile(gaps_arr, 99)), 6),
        "max_cost_gap": round(float(gaps_arr.max()), 6),
        "weights": args.weights,
    }))


if __name__ == "__main__":
    main()
