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
    # d2 default_setup role: dump the fully-merged config for reproducibility
    with open(os.path.join(cfg.OUTPUT_DIR, "config.yaml"), "w") as f:
        f.write(cfg.dump())
    return cfg


def verify_results(cfg, results):
    """Assert eval metrics match cfg.TEST.EXPECTED_RESULTS (the d2
    `verify_results` called at reference train_net.py:385). Each entry is
    ``[task, metric, expected, tolerance]``; raises if any metric is outside
    expected +/- tolerance. No-op when the list is empty."""
    expected = cfg.TEST.EXPECTED_RESULTS
    if not expected:
        return True
    failures = []
    for task, metric, want, tol in expected:
        sub = results.get(task, {})
        got = sub.get(metric)
        if got is None:  # evaluators nest one level, e.g. {'segm': {'AP': x}}
            for v in sub.values():
                if isinstance(v, dict) and metric in v:
                    got = v[metric]
                    break
        if got is None:
            failures.append(f"{task}/{metric}: missing from results")
        elif abs(got - want) > tol:
            failures.append(
                f"{task}/{metric}: got {got:.4f}, expected {want} +/- {tol}")
    if failures:
        raise AssertionError("result verification failed:\n  " +
                             "\n  ".join(failures))
    logging.getLogger(__name__).info("results verified: %s", expected)
    return True


def _maybe_init_distributed(args):
    """Multi-node TPU init (replaces the reference's d2 `launch` + NCCL,
    train_net.py:399-412). Single-process is the default; multi-process pods
    set the standard JAX coordinator env or pass --num-machines > 1."""
    import os

    if args.num_machines > 1 or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        import jax

        jax.distributed.initialize()


def main(args):
    cfg = setup(args)
    # the axon site hook pins the TPU platform regardless of the JAX_PLATFORMS
    # env var; honor the user's choice explicitly
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    _maybe_init_distributed(args)

    if args.eval_only:
        import jax
        import jax.numpy as jnp

        from mp_former_tpu.data.datasets import builtin  # noqa: F401
        from mp_former_tpu.engine.checkpoint_import import load_reference_weights
        from mp_former_tpu.engine.eval_loop import run_evaluation
        from mp_former_tpu.models import build_model

        model = build_model(cfg)
        dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
        params = jax.jit(lambda k, im: model.init(
            {"params": k}, im, None, train=False))(jax.random.PRNGKey(0), dummy)
        # reference --eval-only --resume restores the run's last checkpoint
        # (DetectionCheckpointer.resume_or_load, train_net.py:378-380); with
        # no MODEL.WEIGHTS and no --resume, refuse rather than silently
        # evaluating a randomly initialized model
        weights = cfg.MODEL.WEIGHTS
        if not weights and args.resume:
            ckpt_root = os.path.join(cfg.OUTPUT_DIR, "checkpoints")
            if os.path.isdir(ckpt_root):
                weights = ckpt_root
        if not weights:
            raise ValueError(
                "--eval-only needs MODEL.WEIGHTS, or --resume with a "
                f"checkpoint under {cfg.OUTPUT_DIR}/checkpoints")
        params = {"params": load_reference_weights(weights, params["params"])}

        # distributed eval: batch canvases across every visible device
        # (reference evaluates rank-sharded on all GPUs, eval.sh --num-gpus 4)
        from mp_former_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(cfg) if len(jax.devices()) > 1 else None

        # evaluator family per dataset evaluator_type metadata (reference
        # Trainer.build_evaluator dispatch, train_net.py:142-222); every
        # DATASETS.TEST entry is evaluated (d2 DefaultTrainer.test semantics)
        results = {}
        for dataset_name in cfg.DATASETS.TEST:
            try:
                r = run_evaluation(cfg, model, params, dataset_name,
                                   args.max_eval_images, mesh=mesh)
            except NotImplementedError as e:
                logging.getLogger(__name__).warning("%s", e)
                continue
            results.update(r if len(cfg.DATASETS.TEST) == 1
                           else {dataset_name: r})
        if not results:
            logging.getLogger(__name__).warning(
                "no eval task ran: enable MODEL.MASK_FORMER.TEST.{INSTANCE,"
                "SEMANTIC,PANOPTIC}_ON and make sure the dataset provides the "
                "matching ground truth")
        print(results)
        verify_results(cfg, results)
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
