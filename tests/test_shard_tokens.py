"""TPU.SHARD_TOKENS: SPMD over the encoder token axis.

The reference-exact sampling engine is gather-ROW-bound and rows scale with
encoder tokens, so sharding the token axis over the mesh's `data` axis
divides the per-chip gather floor by the axis size (PERFORMANCE.md round 4).
These tests pin: (a) the sharded forward is numerically identical to the
unsharded one (same per-chip sampling semantics — reference
ops/modules/ms_deform_attn.py:82-125); (b) the annotation is actually live
(the compiled program partitions the token axis); (c) without a mesh
context the knob is a no-op rather than an error.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mp_former_tpu.config import (add_deeplab_config, add_maskformer2_config,
                                  get_cfg)
from mp_former_tpu.models import build_model
from mp_former_tpu.parallel.mesh import maybe_constrain


def _cfg(shard_tokens):
    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    cfg.merge_from_list([
        "MODEL.RESNETS.OUT_FEATURES", "['res2','res3','res4','res5']",
        "MODEL.RESNETS.STRIDE_IN_1X1", "False",
        "MODEL.SEM_SEG_HEAD.NAME", "MaskFormerHead",
        "MODEL.SEM_SEG_HEAD.IN_FEATURES", "['res2','res3','res4','res5']",
        "MODEL.SEM_SEG_HEAD.PIXEL_DECODER_NAME", "MSDeformAttnPixelDecoder",
        "MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS", "2",
        "MODEL.SEM_SEG_HEAD.NUM_CLASSES", "3",
        "MODEL.SEM_SEG_HEAD.CONVS_DIM", "32",
        "MODEL.SEM_SEG_HEAD.MASK_DIM", "32",
        "MODEL.MASK_FORMER.TRANSFORMER_IN_FEATURE", "multi_scale_pixel_decoder",
        "MODEL.MASK_FORMER.TRANSFORMER_DECODER_NAME",
        "MultiScaleMaskedTransformerDecoder",
        "MODEL.MASK_FORMER.HIDDEN_DIM", "32",
        "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "6",
        "MODEL.MASK_FORMER.NHEADS", "4",
        "MODEL.MASK_FORMER.DIM_FEEDFORWARD", "64",
        "MODEL.MASK_FORMER.DEC_LAYERS", "3",
        "TPU.SHARD_TOKENS", str(shard_tokens),
    ])
    return cfg


def _forward(shard_tokens, mesh=None):
    model = build_model(_cfg(shard_tokens))
    images = jnp.asarray(
        np.random.RandomState(0).rand(1, 128, 128, 3).astype(np.float32) * 255)
    params = jax.jit(
        lambda k, im: model.init({"params": k}, im, None, train=False)
    )(jax.random.PRNGKey(0), images)

    fwd = jax.jit(lambda p, im: model.apply(p, im, None, train=False))
    if mesh is None:
        out = fwd(params, images)
        lowered = fwd.lower(params, images)
    else:
        with jax.set_mesh(mesh):
            out = fwd(params, images)
            lowered = fwd.lower(params, images)
    return out, lowered


def test_token_sharded_forward_matches_unsharded():
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
    ref, _ = _forward(False)
    out, lowered = _forward(True, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), np.asarray(ref["pred_logits"]),
        rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out["pred_masks"]), np.asarray(ref["pred_masks"]),
        rtol=2e-4, atol=2e-4)
    # the constraint must be live: the optimized program partitions the
    # token axis, which shows up as cross-device collectives (the value
    # table is all-gathered where spatial structure is rebuilt)
    hlo = lowered.compile().as_text()
    assert "all-gather" in hlo or "all-reduce" in hlo or "collective" in hlo


def test_shard_tokens_is_noop_without_mesh():
    ref, _ = _forward(False)
    out, _ = _forward(True, mesh=None)  # no ambient mesh: identity
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), np.asarray(ref["pred_logits"]),
        rtol=1e-6, atol=1e-6)


def test_maybe_constrain_outside_jit_and_single_axis():
    x = jnp.ones((2, 8, 4))
    # outside any mesh: identity
    np.testing.assert_array_equal(np.asarray(maybe_constrain(x, None, "data")),
                                  np.asarray(x))
    # single-device mesh: identity (axis size 1)
    mesh1 = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("data",))
    with jax.set_mesh(mesh1):
        y = jax.jit(lambda a: maybe_constrain(a, None, "data", None))(x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
