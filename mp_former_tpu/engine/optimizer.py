"""Optimizer + LR schedule factory (reference train_net.py:250-337).

Reproduces the d2 param-group rules with optax masks over the flax param tree:
- backbone params: lr x BACKBONE_MULTIPLIER (:284)
- norm-module params: WEIGHT_DECAY_NORM (:299)
- embedding tables (query_feat/level_embed/label_enc, swin pos tables):
  WEIGHT_DECAY_EMBED (:301-308)
- FrozenBN statistics: not trainable (torch has no params there) -> updates
  zeroed
- full-model grad clip by global norm 0.01 (:316-322)
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

_NORM_TOKENS = ("frozen_bn", "_gn", "norm", "decoder_norm", "layernorm", "bn")
_EMBED_TOKENS = ("query_feat", "query_embed", "level_embed", "label_enc",
                 "embedding", "absolute_pos_embed",
                 "relative_position_bias_table")


def _path_tokens(path) -> list:
    return [getattr(k, "key", getattr(k, "name", str(k))) for k in path]


def is_norm_param(path) -> bool:
    toks = _path_tokens(path)
    return any(any(t in str(tok) for t in _NORM_TOKENS) for tok in toks)


def is_embed_param(path) -> bool:
    toks = _path_tokens(path)
    return any(any(t in str(tok) for t in _EMBED_TOKENS) for tok in toks)


def is_backbone_param(path) -> bool:
    toks = _path_tokens(path)
    return len(toks) > 0 and str(toks[0]) == "backbone"


def is_frozen_param(path) -> bool:
    toks = _path_tokens(path)
    return any("frozen_bn" in str(tok) for tok in toks)


def _mask(params, pred: Callable) -> Any:
    return jax.tree_util.tree_map_with_path(lambda p, _: pred(p), params)


def multi_step_schedule(base_lr, steps, gamma=0.1, warmup_iters=10, warmup_factor=1.0):
    """d2 WarmupMultiStepLR."""
    steps = tuple(steps)

    def sched(count):
        lr = jnp.asarray(base_lr, jnp.float32)
        for s in steps:
            lr = jnp.where(count >= s, lr * gamma, lr)
        if warmup_iters > 0 and warmup_factor < 1.0:
            alpha = jnp.clip(count / warmup_iters, 0.0, 1.0)
            lr = lr * (warmup_factor * (1 - alpha) + alpha)
        return lr

    return sched


def poly_schedule(base_lr, max_iter, power=0.9, constant_ending=0.0,
                  warmup_iters=1000, warmup_factor=1e-3):
    """d2 WarmupPolyLR (used by semantic-seg recipes via add_deeplab_config)."""

    def sched(count):
        frac = jnp.clip(count / max_iter, 0.0, 1.0)
        poly = jnp.maximum((1.0 - frac) ** power, constant_ending)
        lr = base_lr * poly
        if warmup_iters > 0:
            alpha = jnp.clip(count / warmup_iters, 0.0, 1.0)
            lr = lr * (warmup_factor * (1 - alpha) + alpha)
        return lr

    return sched


def build_lr_schedule(cfg):
    name = cfg.SOLVER.LR_SCHEDULER_NAME
    if name == "WarmupMultiStepLR":
        return multi_step_schedule(
            cfg.SOLVER.BASE_LR, cfg.SOLVER.STEPS, cfg.SOLVER.GAMMA,
            cfg.SOLVER.WARMUP_ITERS, cfg.SOLVER.WARMUP_FACTOR)
    if name == "WarmupPolyLR":
        return poly_schedule(
            cfg.SOLVER.BASE_LR, cfg.SOLVER.MAX_ITER, cfg.SOLVER.POLY_LR_POWER,
            cfg.SOLVER.POLY_LR_CONSTANT_ENDING, cfg.SOLVER.WARMUP_ITERS,
            cfg.SOLVER.WARMUP_FACTOR)
    raise ValueError(f"Unknown LR scheduler {name}")


def build_optimizer(cfg, params) -> optax.GradientTransformation:
    """Reference Trainer.build_optimizer (train_net.py:258-337)."""
    sched = build_lr_schedule(cfg)
    wd = cfg.SOLVER.WEIGHT_DECAY
    wd_norm = cfg.SOLVER.WEIGHT_DECAY_NORM
    wd_embed = cfg.SOLVER.WEIGHT_DECAY_EMBED
    bb_mult = cfg.SOLVER.BACKBONE_MULTIPLIER

    def wd_for(path, _):
        if is_norm_param(path):
            return wd_norm
        if is_embed_param(path):
            return wd_embed
        return wd

    wd_tree = jax.tree_util.tree_map_with_path(wd_for, params)

    def add_decayed(updates, state, p):
        upd = jax.tree_util.tree_map(
            lambda u, pp, w: u + w * pp, updates, p, wd_tree)
        return upd, state

    chain = []
    if cfg.SOLVER.CLIP_GRADIENTS.ENABLED:
        if cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE == "full_model":
            chain.append(optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE))
        elif cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE == "value":
            chain.append(optax.clip(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE))
        elif cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE == "norm":
            chain.append(optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE))

    if cfg.SOLVER.OPTIMIZER == "ADAMW":
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        chain.append(optax.GradientTransformation(
            lambda p: optax.EmptyState(), add_decayed))
    elif cfg.SOLVER.OPTIMIZER == "SGD":
        chain.append(optax.trace(decay=cfg.SOLVER.MOMENTUM, nesterov=cfg.SOLVER.NESTEROV))
        chain.append(optax.GradientTransformation(
            lambda p: optax.EmptyState(), add_decayed))
    else:
        raise NotImplementedError(f"no optimizer type {cfg.SOLVER.OPTIMIZER}")

    chain.append(optax.scale_by_schedule(lambda c: -sched(c)))
    # backbone lr multiplier applies to the final update (equivalent to a
    # param-group lr of bb_mult * base_lr)
    chain.append(optax.masked(
        optax.scale(bb_mult), _mask(params, is_backbone_param)))
    # FrozenBN stats have no torch counterpart params — never update
    chain.append(optax.masked(
        optax.scale(0.0), _mask(params, is_frozen_param)))
    # MODEL.BACKBONE.FREEZE_AT (d2 semantics: 1 = stem, 2 = stem+res2, ...;
    # d2 sets requires_grad=False — here the update is zeroed instead)
    freeze_at = cfg.MODEL.BACKBONE.FREEZE_AT
    if freeze_at > 0:
        def frozen_by_stage(path) -> bool:
            toks = [str(t) for t in _path_tokens(path)]
            if not toks or toks[0] != "backbone" or len(toks) < 2:
                return False
            name = toks[1]
            if name.startswith(("stem_", "patch_embed", "absolute_pos_embed")):
                return True
            for s in range(2, 6):
                if freeze_at >= s and (name.startswith(f"res{s}_")
                                       or name.startswith(f"layers_{s - 2}_")):
                    return True
            return False

        chain.append(optax.masked(
            optax.scale(0.0), _mask(params, frozen_by_stage)))
    return optax.chain(*chain)
