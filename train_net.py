#!/usr/bin/env python
"""MP-Former TPU training/eval CLI (mirrors reference train_net.py surface).

Examples (same flags as the reference, reference run_50ep_no_noise_all_ly.sh):
  python train_net.py --config-file configs/coco/instance-segmentation/maskformer2_R50_bs16_12ep_DN_query.yaml \
      MODEL.MASK_FORMER.DN_MODE points MODEL.MASK_FORMER.ALL_LY_DN True
  python train_net.py --config-file ... --eval-only MODEL.WEIGHTS model_final.pth
"""

import argparse
import logging
import os
import sys


def default_argument_parser():
    p = argparse.ArgumentParser(description="MP-Former TPU")
    p.add_argument("--config-file", default="", metavar="FILE")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--num-gpus", type=int, default=1,
                   help="accepted for CLI compat; device count comes from JAX")
    p.add_argument("--num-machines", type=int, default=1)
    p.add_argument("--machine-rank", type=int, default=0)
    p.add_argument("--dist-url", default="auto")
    p.add_argument("--max-eval-images", type=int, default=None)
    p.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return p


def setup(args):
    """Reference setup (train_net.py:356-370): cfg composition + freeze."""
    from mp_former_tpu.config import (add_deeplab_config, add_maskformer2_config,
                                      get_cfg)

    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts or [])
    # INSTANT_DROP hack (reference train_net.py:388-392)
    if cfg.SOLVER.INSTANT_DROP:
        drop = cfg.SOLVER.DROP_EP
        iters_ep = cfg.SOLVER.MAX_ITER // 12
        cfg.SOLVER.STEPS = (int(drop * iters_ep), int((drop + 100) * iters_ep))
    cfg.freeze()
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s: %(message)s")
    return cfg


def main(args):
    cfg = setup(args)

    if args.eval_only:
        import jax

        from mp_former_tpu.data.catalog import DatasetCatalog
        from mp_former_tpu.data.datasets import builtin  # noqa: F401
        from mp_former_tpu.engine.checkpoint_import import load_reference_weights
        from mp_former_tpu.engine.eval_loop import inference_on_dataset
        from mp_former_tpu.evaluation.evaluators import COCOEvaluator
        from mp_former_tpu.models import build_model
        import jax.numpy as jnp
        import numpy as np

        model = build_model(cfg)
        records = DatasetCatalog.get(cfg.DATASETS.TEST[0])
        h = cfg.INPUT.MIN_SIZE_TEST or 800
        w = cfg.INPUT.MAX_SIZE_TEST or 1333
        dummy = jnp.asarray(np.zeros((1, (h + 31) // 32 * 32, (w + 31) // 32 * 32, 3), np.float32))
        params = model.init({"params": jax.random.PRNGKey(0)}, dummy, None, train=False)
        if cfg.MODEL.WEIGHTS:
            params = {"params": load_reference_weights(cfg.MODEL.WEIGHTS, params["params"])}
        evaluator = COCOEvaluator(records)
        results = inference_on_dataset(
            cfg, model, params, records, evaluator, args.max_eval_images)
        print(results)
        return results

    from mp_former_tpu.data.loader import build_train_loader
    from mp_former_tpu.engine.trainer import Trainer

    loader = build_train_loader(cfg)
    trainer = Trainer(cfg, loader)
    start = trainer.resume_or_load(resume=args.resume)
    trainer.train(start)


if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    main(args)
