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
        # reference --eval-only --resume restores the run's last checkpoint
        # (DetectionCheckpointer.resume_or_load); refuse a silently random
        # model when neither MODEL.WEIGHTS nor a resumable checkpoint exists
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
        # whole-clip inference (reference video_maskformer_model.py:255-287);
        # device-sharded over the data mesh when it has >1 device
        from mp_former_tpu.parallel.mesh import create_mesh
        mesh = create_mesh(cfg) if len(jax.devices()) > 1 else None
        results = inference_on_video_dataset(
            cfg, model, params, records, args.max_eval_videos, mesh=mesh)
        print(results)
        return results

    # full Trainer path (same engine as images: prefetch loader, GSPMD mesh,
    # Orbax checkpoints/resume, metrics.json, periodic eval)
    from mp_former_tpu.data.loader import TrainLoader
    from mp_former_tpu.engine.trainer import Trainer
    from mp_former_tpu.engine.train_step import Batch
    from mp_former_tpu.video import VideoTargets
    from mp_former_tpu.video.criterion import build_video_criterion

    records = DatasetCatalog.get(cfg.DATASETS.TRAIN[0])
    mapper = YTVISDatasetMapper(cfg, is_train=True,
                                max_instances=cfg.TPU.MAX_INSTANCES)

    def collate(samples):
        from mp_former_tpu.structures import pack_bool_masks

        # uint8 frames + bit-packed tube masks; unpacked on device inside
        # the jitted step (structures.unpack_batch_masks)
        return Batch(
            images=jnp.asarray(np.stack([s["image"] for s in samples])),
            targets=VideoTargets(
                labels=jnp.asarray(np.stack([s["labels"] for s in samples])),
                masks=jnp.asarray(pack_bool_masks(
                    np.stack([s["masks"] for s in samples]))),
                valid=jnp.asarray(np.stack([s["valid"] for s in samples]))))

    loader = TrainLoader(
        records, mapper, cfg.SOLVER.IMS_PER_BATCH, seed=max(cfg.SEED, 0),
        num_workers=cfg.DATALOADER.NUM_WORKERS,
        filter_empty=cfg.DATALOADER.FILTER_EMPTY_ANNOTATIONS,
        collate_fn=collate)
    trainer = Trainer(cfg, loader, model=model,
                      criterion=build_video_criterion(cfg))
    start = trainer.resume_or_load(resume=args.resume)
    trainer.train(start)


if __name__ == "__main__":
    main(default_argument_parser().parse_args())
