"""Optimizer param-group rules (reference Trainer.build_optimizer,
train_net.py:258-337): embed group membership, FREEZE_AT zeroed updates."""

import numpy as np

import jax
import jax.numpy as jnp

from mp_former_tpu.config import (add_deeplab_config, add_maskformer2_config,
                                  get_cfg)
from mp_former_tpu.engine.optimizer import (build_optimizer, is_embed_param,
                                            is_norm_param)


def _cfg(**overrides):
    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    kv = []
    for k, v in overrides.items():
        kv += [k.replace("__", "."), str(v)]
    if kv:
        cfg.merge_from_list(kv)
    return cfg


def _path(*names):
    return tuple(jax.tree_util.DictKey(n) for n in names)


def test_query_embed_is_embed_group():
    # every nn.Embedding-style table decays at WEIGHT_DECAY_EMBED (0.0)
    assert is_embed_param(_path("sem_seg_head", "predictor", "query_embed"))
    assert is_embed_param(_path("sem_seg_head", "predictor", "query_feat"))
    assert is_embed_param(_path("predictor", "label_enc", "embedding"))
    assert not is_embed_param(_path("sem_seg_head", "predictor", "class_embed"))
    assert is_norm_param(_path("backbone", "res2_0", "conv1_frozen_bn"))


def test_freeze_at_zeroes_backbone_stage_updates():
    cfg = _cfg(MODEL__BACKBONE__FREEZE_AT=2, SOLVER__BASE_LR=1.0,
               SOLVER__WARMUP_ITERS=0)
    params = {
        "backbone": {
            "stem_conv1": {"kernel": jnp.ones((3, 3, 3, 8))},
            "res2_0": {"conv1": {"kernel": jnp.ones((1, 1, 8, 8))}},
            "res3_0": {"conv1": {"kernel": jnp.ones((1, 1, 8, 8))}},
        },
        "sem_seg_head": {"w": jnp.ones((4,))},
    }
    tx = build_optimizer(cfg, params)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["backbone"]["stem_conv1"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(updates["backbone"]["res2_0"]["conv1"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(updates["backbone"]["res3_0"]["conv1"]["kernel"]).max()) > 0.0
    assert float(jnp.abs(updates["sem_seg_head"]["w"]).max()) > 0.0


def test_freeze_at_zero_trains_everything():
    cfg = _cfg(MODEL__BACKBONE__FREEZE_AT=0, SOLVER__BASE_LR=1.0,
               SOLVER__WARMUP_ITERS=0)
    params = {"backbone": {"stem_conv1": {"kernel": jnp.ones((3, 3, 3, 8))}}}
    tx = build_optimizer(cfg, params)
    updates, _ = tx.update(
        jax.tree.map(jnp.ones_like, params), tx.init(params), params)
    assert float(jnp.abs(updates["backbone"]["stem_conv1"]["kernel"]).max()) > 0.0
