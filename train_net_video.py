#!/usr/bin/env python
"""Video instance segmentation CLI (mirrors reference train_net_video.py)."""

import argparse
import logging
import os


def default_argument_parser():
    p = argparse.ArgumentParser(description="MP-Former TPU (video)")
    p.add_argument("--config-file", default="", metavar="FILE")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--num-gpus", type=int, default=1)
    p.add_argument("--max-eval-videos", type=int, default=None)
    p.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return p


def setup(args):
    from mp_former_tpu.config import (add_deeplab_config, add_maskformer2_config,
                                      add_maskformer2_video_config, get_cfg)

    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    add_maskformer2_video_config(cfg)
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts or [])
    cfg.freeze()
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    logging.basicConfig(level=logging.INFO)
    return cfg


def main(args):
    cfg = setup(args)
    # the axon site hook pins the TPU platform regardless of the JAX_PLATFORMS
    # env var; honor the user's choice explicitly
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    import jax
    import jax.numpy as jnp
    import numpy as np

    import mp_former_tpu.video  # noqa: F401 — register video components
    from mp_former_tpu.data.catalog import DatasetCatalog
    from mp_former_tpu.models import build_model
    from mp_former_tpu.video.ytvis import YTVISDatasetMapper, register_all_ytvis

    register_all_ytvis()
    model = build_model(cfg)

    if args.eval_only:
        from mp_former_tpu.engine.checkpoint_import import load_reference_weights
        from mp_former_tpu.video.eval_loop import inference_on_video_dataset

        records = DatasetCatalog.get(cfg.DATASETS.TEST[0])
        t = cfg.INPUT.SAMPLING_FRAME_NUM
        # init under jit at a tiny size: param shapes are image-size
        # independent, and eager init is pathologically slow on remote TPU
        dummy = jnp.zeros((1, t, 64, 64, 3), jnp.float32)
        params = jax.jit(lambda k, im: model.init(
            {"params": k}, im, None, train=False))(jax.random.PRNGKey(0), dummy)
        if cfg.MODEL.WEIGHTS:
            params = {"params": load_reference_weights(cfg.MODEL.WEIGHTS,
                                                       params["params"])}
        # whole-clip inference (reference video_maskformer_model.py:255-287)
        results = inference_on_video_dataset(
            cfg, model, params, records, args.max_eval_videos)
        print(results)
        return results

    from mp_former_tpu.data.loader import TrainLoader
    from mp_former_tpu.engine.optimizer import build_optimizer
    from mp_former_tpu.engine.train_step import create_train_state
    from mp_former_tpu.video.criterion import build_video_criterion
    from mp_former_tpu.video import VideoTargets
    import optax

    records = DatasetCatalog.get(cfg.DATASETS.TRAIN[0])
    mapper = YTVISDatasetMapper(cfg, is_train=True)
    criterion = build_video_criterion(cfg)

    def collate(samples):
        return {
            "images": jnp.asarray(np.stack([s["image"] for s in samples])),
            "targets": VideoTargets(
                labels=jnp.asarray(np.stack([s["labels"] for s in samples])),
                masks=jnp.asarray(np.stack([s["masks"] for s in samples])),
                valid=jnp.asarray(np.stack([s["valid"] for s in samples]))),
        }

    # simple loop (static shapes per aspect bucket handled by the mapper)
    rng = np.random.RandomState(max(cfg.SEED, 0))
    batch = [mapper(records[i % len(records)], rng)
             for i in range(cfg.SOLVER.IMS_PER_BATCH)]
    batch = collate([b for b in batch if b is not None])
    t = cfg.INPUT.SAMPLING_FRAME_NUM
    params = jax.jit(lambda k, im: model.init(
        {"params": k, "dropout": jax.random.PRNGKey(1)}, im, None, train=True)
    )(jax.random.PRNGKey(0), jnp.zeros((1, t, 64, 64, 3), jnp.float32))["params"]
    tx = build_optimizer(cfg, params)
    state = create_train_state(params, tx)

    @jax.jit
    def step(state, images, targets, key):
        def loss_fn(p):
            out = model.apply({"params": p}, images, targets, train=True,
                              rngs={"dropout": key})
            losses = criterion(out, targets, key)
            return criterion.weighted_total(losses), losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt = tx.update(grads, state.opt_state, state.params)
        return state._replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            opt_state=opt), total

    for it in range(cfg.SOLVER.MAX_ITER):
        state, total = step(state, batch["images"], batch["targets"],
                            jax.random.PRNGKey(it))
        if it % 20 == 0:
            print(f"iter {it} total_loss {float(total):.4f}")
        b = [mapper(records[rng.randint(len(records))], rng)
             for _ in range(cfg.SOLVER.IMS_PER_BATCH)]
        b = [x for x in b if x is not None]
        if len(b) == cfg.SOLVER.IMS_PER_BATCH:
            batch = collate(b)


if __name__ == "__main__":
    main(default_argument_parser().parse_args())
