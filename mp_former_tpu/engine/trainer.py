"""Trainer (replaces d2 DefaultTrainer usage in reference train_net.py:137).

Responsibilities: build model/criterion/optimizer from cfg, restore or
initialize state (Orbax), run the jitted train step over the data-parallel
mesh, log metrics, checkpoint periodically, optionally eval periodically.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def _shrink_for_init(batch, target: int = 64):
    """Slice a train batch to (B=1, <=64px) for model.init.

    Param shapes do not depend on batch or spatial size, but flax init
    traces a REAL forward — at the published recipe scale (bs16@1024 LSJ,
    Base-COCO-InstanceSegmentation.yaml) that init forward alone exhausted
    chip HBM before the first train step. 64px keeps every stride-32
    feature level non-empty. Handles image (B,H,W,3) and video (B,T,H,W,3)
    layouts, and bit-packed GT masks (structures.pack_bool_masks); falls
    back to batch-only slicing when the spatial cut would not be exact.
    """
    im = batch.images
    h, w = im.shape[-3], im.shape[-2]
    sh, sw = min(h, target), min(w, target)
    t = batch.targets
    m = t.masks
    packed = m.dtype == np.uint8
    mw_full = m.shape[-1] * (8 if packed else 1)
    ok = (m.shape[-2] > 0 and mw_full > 0
          and h % m.shape[-2] == 0 and w % mw_full == 0)
    if ok:
        stride_h, stride_w = h // m.shape[-2], w // mw_full
        ok = (sh % stride_h == 0 and sw % stride_w == 0
              and (not packed or (sw // stride_w) % 8 == 0))
    if ok:
        msh = sh // stride_h
        msw = (sw // stride_w) // 8 if packed else sw // stride_w
        images = im[:1, ..., :sh, :sw, :]
        masks = m[:1, ..., :msh, :msw]
    else:
        images, masks = im[:1], m[:1]
    kw = {"labels": t.labels[:1], "masks": masks, "valid": t.valid[:1]}
    if hasattr(t, "boxes"):
        kw["boxes"] = t.boxes[:1]
    return batch._replace(images=images, targets=t._replace(**kw))


class Trainer:
    def __init__(self, cfg, train_loader=None, model=None, criterion=None):
        """model/criterion default to the image stack; the video CLI passes
        VideoMaskFormer + VideoSetCriterion (same Batch/TrainState shapes)."""
        import optax

        from ..models import build_model
        from ..models.criterion import build_criterion
        from ..parallel.mesh import create_mesh, replicate, shard_batch
        from .optimizer import build_optimizer
        from .train_step import Batch, create_train_state, make_train_step

        self.cfg = cfg
        self.model = model if model is not None else build_model(cfg)
        self.criterion = criterion if criterion is not None \
            else build_criterion(cfg)
        self.mesh = create_mesh(cfg)
        self._shard_batch = lambda b: shard_batch(self.mesh, b)
        self._replicate = lambda t: replicate(self.mesh, t)
        self.train_loader = train_loader
        self.max_iter = cfg.SOLVER.MAX_ITER
        self.profile_dir = cfg.TPU.get("PROFILE_DIR", "") if hasattr(cfg.TPU, "get") else ""
        self.checkpoint_period = cfg.SOLVER.CHECKPOINT_PERIOD
        self.output_dir = cfg.OUTPUT_DIR
        os.makedirs(self.output_dir, exist_ok=True)

        # init params from a sample batch shape
        seed = max(cfg.SEED, 0)
        self.rng = jax.random.PRNGKey(seed)
        batch = next(iter(train_loader)) if train_loader is not None else None
        assert batch is not None, "Trainer requires a train loader"
        mesh_size = int(np.prod(self.mesh.devices.shape))
        if batch.images.shape[0] % mesh_size:
            raise ValueError(
                f"SOLVER.IMS_PER_BATCH={batch.images.shape[0]} must be divisible "
                f"by the data-parallel mesh size {mesh_size} (TPU.MESH_SHAPE)")
        from ..structures import unpack_batch_masks

        init_batch = unpack_batch_masks(_shrink_for_init(batch))
        with jax.set_mesh(self.mesh):
            params = self.model.init(
                {"params": jax.random.PRNGKey(seed),
                 "dn": jax.random.PRNGKey(seed + 1),
                 "dropout": jax.random.PRNGKey(seed + 2)},
                init_batch.images, init_batch.targets, train=True)["params"]
            self.tx = build_optimizer(cfg, params)
            self.state = self._replicate(create_train_state(params, self.tx))
        accum = int(getattr(cfg.TPU, "GRAD_ACCUM_STEPS", 1) or 1)
        if accum > 1:
            if batch.images.shape[0] % accum:
                raise ValueError(
                    f"SOLVER.IMS_PER_BATCH={batch.images.shape[0]} must be "
                    f"divisible by TPU.GRAD_ACCUM_STEPS={accum}")
            if (batch.images.shape[0] // accum) % mesh_size:
                raise ValueError(
                    f"micro-batch {batch.images.shape[0]}//{accum} must be "
                    f"divisible by the mesh size {mesh_size}")
        # TPU.DONATE False keeps train-state buffers undonated: costs one
        # extra state copy of HBM but works around a deterministic axon
        # client abort ("index out of bounds" at client.rs:2008, index ==
        # input-buffer count) seen ONLY with donation at large buffer counts
        # (bs16@1024 accum-8; PERFORMANCE.md round 4)
        self.train_step = make_train_step(
            self.model, self.criterion, self.tx, accum=accum,
            donate=bool(getattr(cfg.TPU, "DONATE", True)),
            split=bool(getattr(cfg.TPU, "SPLIT_STEP", False)),
            host_accum=bool(getattr(cfg.TPU, "HOST_ACCUM", False)))
        # host-exact matching: solve the LSA with scipy on host between a
        # cost pass and the grad pass (reference's CPU hop; axon has no
        # in-jit host callbacks). ~1 extra forward per step — A/B tool for
        # bounding the on-device auction's suboptimality, not a fast path.
        self.host_exact = bool(cfg.TPU.MATCHER_HOST_EXACT)
        self.dn_group_bucket = int(getattr(cfg.TPU, "DN_GROUP_BUCKET", 1) or 1)
        if self.host_exact:
            if jax.process_count() > 1:
                # np.asarray on the batch-sharded cost tensor would need
                # shards owned by other processes
                raise ValueError(
                    "TPU.MATCHER_HOST_EXACT requires single-process "
                    f"execution (jax.process_count()={jax.process_count()}); "
                    "it fetches the full cost tensor to the host")
            from .train_step import make_cost_step

            self.cost_step = make_cost_step(self.model, self.criterion)
        self._first_batch = batch

        self._ckpt_mgr = None

    # -- checkpointing (Orbax; replaces DetectionCheckpointer) ----------
    def _manager(self):
        if self._ckpt_mgr is None:
            import orbax.checkpoint as ocp

            self._ckpt_mgr = ocp.CheckpointManager(
                os.path.abspath(os.path.join(self.output_dir, "checkpoints")),
                options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
            )
        return self._ckpt_mgr

    def save(self, step: int):
        import orbax.checkpoint as ocp

        self._manager().save(
            step, args=ocp.args.StandardSave(jax.tree.map(np.asarray, self.state)))
        self._manager().wait_until_finished()

    def resume_or_load(self, resume: bool = True):
        """d2 resume_or_load equivalent: resume from last checkpoint if
        present, else load cfg.MODEL.WEIGHTS (torch .pth via converter)."""
        import orbax.checkpoint as ocp

        mgr = self._manager()
        latest = mgr.latest_step()
        if resume and latest is not None:
            restored = mgr.restore(
                latest, args=ocp.args.StandardRestore(
                    jax.tree.map(np.asarray, self.state)))
            self.state = self._replicate(restored)
            logger.info("resumed from checkpoint step %d", latest)
            return int(latest)
        weights = self.cfg.MODEL.WEIGHTS
        if weights:
            from .checkpoint_import import load_reference_weights

            # training may fall back to a fresh init (e.g. an ImageNet pkl
            # URL unreachable from this environment); eval paths keep the
            # raising default so a mistyped checkpoint cannot silently
            # report fresh-init metrics
            params = load_reference_weights(
                weights, self.state.params, allow_fresh_init=True)
            self.state = self.state._replace(params=self._replicate(params))
            logger.info("loaded weights from %s", weights)
        return 0

    # -- train loop ------------------------------------------------------
    def train(self, start_iter: int = 0, hooks: Optional[Dict[str, Callable]] = None):
        metrics_path = os.path.join(self.output_dir, "metrics.json")
        it = iter(self.train_loader)
        batch = self._first_batch
        t_data = 0.0
        with jax.set_mesh(self.mesh):
            for step in range(start_iter, self.max_iter):
                if self.profile_dir and step == start_iter + 5:
                    jax.profiler.start_trace(self.profile_dir)
                if self.profile_dir and step == start_iter + 8:
                    jax.profiler.stop_trace()
                sharded = self._shard_batch(batch)
                # NUM_DN >= 100: group count = budget // batch max GT
                # (host-side; reference decoder :973-974)
                from .train_step import compute_dn_groups

                dn_groups = compute_dn_groups(
                    getattr(self.model, "scalar", 0), batch.targets.valid,
                    bucket=self.dn_group_bucket)
                assignments = None
                if self.host_exact:
                    from ..models.matcher import _lsa_host

                    costs = np.asarray(self.cost_step(
                        self.state, sharded, self.rng, dn_groups=dn_groups))
                    l, b, q, n = costs.shape
                    assignments = jnp.asarray(_lsa_host(
                        costs.reshape(l * b, q, n)).reshape(l, b, n))
                state, metrics = self.train_step(
                    self.state, sharded, self.rng, dn_groups=dn_groups,
                    assignments=assignments)
                self.state = state
                t0 = time.perf_counter()
                batch = next(it)  # overlap host data with device compute
                t_data += time.perf_counter() - t0

                if step % 20 == 0 or step == self.max_iter - 1:
                    m = {k: float(v) for k, v in jax.tree.map(
                        lambda x: x, metrics).items()}
                    m["iteration"] = step
                    m["data_time"] = t_data / max(step - start_iter + 1, 1)
                    logger.info(
                        "iter %d total_loss %.4f loss_ce %.4f loss_mask %.4f loss_dice %.4f",
                        step, m["total_loss"], m.get("loss_ce", 0.0),
                        m.get("loss_mask", 0.0), m.get("loss_dice", 0.0))
                    with open(metrics_path, "a") as f:
                        f.write(json.dumps(m) + "\n")
                if hooks:
                    for h in hooks.values():
                        h(step, self)
                if (step + 1) % self.checkpoint_period == 0:
                    self.save(step + 1)
                eval_period = self.cfg.TEST.EVAL_PERIOD
                if eval_period and (step + 1) % eval_period == 0:
                    self.test(max_images=self.cfg.TEST.get("MAX_EVAL_IMAGES", None)
                              if hasattr(self.cfg.TEST, "get") else None)
        self.save(self.max_iter)

    def test(self, max_images=None):
        """Periodic eval during training (d2 Trainer.test / TEST.EVAL_PERIOD,
        reference Base-COCO-InstanceSegmentation.yaml:41-42). Evaluator
        family is dispatched per dataset evaluator_type (reference
        Trainer.build_evaluator, train_net.py:142-222)."""
        from ..data.catalog import DatasetCatalog
        from ..video.video_maskformer import VideoMaskFormer
        from .eval_loop import run_evaluation

        if not self.cfg.DATASETS.TEST:
            return None
        results = {}
        for name in self.cfg.DATASETS.TEST:
            if name not in DatasetCatalog:
                logger.warning("eval dataset %s not registered; skipping", name)
                continue
            try:
                if isinstance(self.model, VideoMaskFormer):
                    from ..video.eval_loop import inference_on_video_dataset

                    r = inference_on_video_dataset(
                        self.cfg, self.model, {"params": self.state.params},
                        DatasetCatalog.get(name), max_images,
                        mesh=self.mesh)
                else:
                    r = run_evaluation(
                        self.cfg, self.model, {"params": self.state.params},
                        name, max_images, mesh=self.mesh)
            except NotImplementedError as e:
                logger.warning("%s", e)
                continue
            results.update(r if len(self.cfg.DATASETS.TEST) == 1
                           else {name: r})
        logger.info("eval results: %s", results)
        return results or None
