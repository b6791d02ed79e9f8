"""Data-parallel correctness: the jitted train step under a 4-device mesh
produces the same loss and updated params as single-device execution
(GSPMD gradient reduction == DDP semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mp_former_tpu.config import get_cfg, add_deeplab_config, add_maskformer2_config
from mp_former_tpu.engine.optimizer import build_optimizer
from mp_former_tpu.engine.train_step import Batch, create_train_state, make_train_step
from mp_former_tpu.models import build_model
from mp_former_tpu.models.criterion import build_criterion
from mp_former_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from mp_former_tpu.structures import Targets


def _setup(mesh_size):
    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    cfg.merge_from_list([
        "MODEL.RESNETS.OUT_FEATURES", "['res2','res3','res4','res5']",
        "MODEL.RESNETS.STRIDE_IN_1X1", "False",
        "MODEL.SEM_SEG_HEAD.NAME", "MaskFormerHead",
        "MODEL.SEM_SEG_HEAD.IN_FEATURES", "['res2','res3','res4','res5']",
        "MODEL.SEM_SEG_HEAD.PIXEL_DECODER_NAME", "MSDeformAttnPixelDecoder",
        "MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS", "1",
        "MODEL.SEM_SEG_HEAD.NUM_CLASSES", "3",
        "MODEL.SEM_SEG_HEAD.CONVS_DIM", "32",
        "MODEL.SEM_SEG_HEAD.MASK_DIM", "32",
        "MODEL.MASK_FORMER.TRANSFORMER_IN_FEATURE", "multi_scale_pixel_decoder",
        "MODEL.MASK_FORMER.TRANSFORMER_DECODER_NAME",
        "MultiScaleMaskedTransformerDecoderMaskDN",
        "MODEL.MASK_FORMER.DN_MODE", "points",
        "MODEL.MASK_FORMER.HIDDEN_DIM", "32",
        "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "6",
        "MODEL.MASK_FORMER.NHEADS", "4",
        "MODEL.MASK_FORMER.DIM_FEEDFORWARD", "64",
        "MODEL.MASK_FORMER.DEC_LAYERS", "3",
        "MODEL.MASK_FORMER.TRAIN_NUM_POINTS", "128",
        "MODEL.DN.NUM_DN", "1",
        "MODEL.DN.NOISE_SCALE", "0.0",
        "MODEL.MASK_FORMER.LB_NOISE_RATIO", "-1.0",
        "TPU.MESH_SHAPE", f"[{mesh_size}]",
    ])
    return cfg


def _batch(b=4, n=3, hw=64):
    rng = np.random.RandomState(0)
    masks = np.zeros((b, n, hw, hw), bool)
    masks[:, 0, 8:40, 8:40] = True
    masks[:, 1, 30:60, 30:60] = True
    return Batch(
        images=jnp.asarray(rng.rand(b, hw, hw, 3).astype(np.float32) * 255),
        targets=Targets(
            labels=jnp.asarray(rng.randint(0, 3, (b, n)), jnp.int32),
            masks=jnp.asarray(masks),
            boxes=jnp.asarray(rng.rand(b, n, 4), jnp.float32),
            valid=jnp.asarray(np.tile([True, True, False], (b, 1))),
        ))


def _run(mesh_size):
    cfg = _setup(mesh_size)
    model = build_model(cfg)
    criterion = build_criterion(cfg)
    batch = _batch()
    mesh = create_mesh(cfg)
    with jax.set_mesh(mesh):
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dn": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)},
            batch.images, batch.targets, train=True)["params"]
        tx = build_optimizer(cfg, params)
        state = replicate(mesh, create_train_state(params, tx))
        sharded = shard_batch(mesh, batch)
        step = make_train_step(model, criterion, tx, donate=False)
        new_state, metrics = step(state, sharded, jax.random.PRNGKey(3))
        loss = float(metrics["total_loss"])
        leaf = np.asarray(new_state.params["sem_seg_head"]["predictor"]["query_feat"])
    return loss, leaf


def test_mesh4_matches_mesh1():
    loss1, leaf1 = _run(1)
    loss4, leaf4 = _run(4)
    assert abs(loss1 - loss4) / max(abs(loss1), 1) < 5e-4, (loss1, loss4)
    np.testing.assert_allclose(leaf1, leaf4, rtol=2e-3, atol=2e-5)


def test_host_exact_two_phase_matches_single_phase():
    """The host-exact matcher mode (make_cost_step -> host scipy ->
    train_step(assignments=...)) must reproduce the single-phase step
    exactly on CPU, where the in-jit matcher already uses the same scipy
    solver: identical rng folding -> identical costs -> identical
    assignments -> identical losses and updated params."""
    from mp_former_tpu.engine.train_step import make_cost_step
    from mp_former_tpu.models.matcher import _lsa_host

    cfg = _setup(1)
    model = build_model(cfg)
    criterion = build_criterion(cfg)
    batch = _batch()
    mesh = create_mesh(cfg)
    with jax.set_mesh(mesh):
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dn": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)},
            batch.images, batch.targets, train=True)["params"]
        tx = build_optimizer(cfg, params)
        state = replicate(mesh, create_train_state(params, tx))
        sharded = shard_batch(mesh, batch)
        step = make_train_step(model, criterion, tx, donate=False)
        rng = jax.random.PRNGKey(3)

        _, metrics1 = step(state, sharded, rng)

        cost_step = make_cost_step(model, criterion)
        costs = np.asarray(cost_step(state, sharded, rng))
        l, b, q, n = costs.shape
        assignments = jnp.asarray(
            _lsa_host(costs.reshape(l * b, q, n)).reshape(l, b, n))
        _, metrics2 = step(state, sharded, rng, assignments=assignments)

    for k in metrics1:
        np.testing.assert_allclose(
            float(metrics1[k]), float(metrics2[k]), rtol=1e-5, atol=1e-6,
            err_msg=k)
