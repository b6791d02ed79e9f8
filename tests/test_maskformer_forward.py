"""End-to-end model forward smoke tests: build from the real reference YAML,
run eval + DN-train forwards, check output pytree shapes."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mp_former_tpu.config import get_cfg, add_deeplab_config, add_maskformer2_config
from mp_former_tpu.models import build_model
from mp_former_tpu.structures import Targets

REF = "/root/reference/configs/coco/instance-segmentation/maskformer2_R50_bs16_12ep_DN_query.yaml"


def _cfg(opts=()):
    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    if os.path.exists(REF):
        cfg.merge_from_file(REF)
    cfg.merge_from_list(list(opts))
    return cfg


@pytest.fixture(scope="module")
def small_model():
    """R50 + full head at tiny spatial size to keep CPU tests fast."""
    cfg = _cfg([
        "MODEL.MASK_FORMER.TRANSFORMER_DECODER_NAME",
        "MultiScaleMaskedTransformerDecoderMaskDN",
        "MODEL.MASK_FORMER.DN_MODE", "points",
        "MODEL.MASK_FORMER.ALL_LY_DN", "True",
        "MODEL.MASK_FORMER.LB_NOISE_RATIO", "0.2",
        "MODEL.DN.NUM_DN", "1",
        "MODEL.DN.NOISE_SCALE", "0.0",
        "MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS", "1",
        "MODEL.MASK_FORMER.DEC_LAYERS", "4",
        "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "10",
    ])
    model = build_model(cfg)
    B, H, W = 1, 64, 64
    images = jnp.asarray(np.random.RandomState(0).rand(B, H, W, 3) * 255, jnp.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dn": jax.random.PRNGKey(1)},
        images, None, train=False)
    return cfg, model, params, images


def test_eval_forward_shapes(small_model):
    cfg, model, params, images = small_model
    out = model.apply(params, images, None, train=False)
    K = cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES
    Q = cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES
    assert out["pred_logits"].shape == (1, Q, K + 1)
    assert out["pred_masks"].shape == (1, Q, 16, 16)  # 1/4 of 64
    assert len(out["aux_outputs"]) == cfg.MODEL.MASK_FORMER.DEC_LAYERS - 1
    assert out["dn_out"] is None


def test_train_forward_with_dn(small_model):
    cfg, model, params, images = small_model
    N = 5
    rng = np.random.RandomState(1)
    masks = np.zeros((1, N, 64, 64), bool)
    for i in range(3):
        y, x = rng.randint(0, 32, 2)
        masks[0, i, y:y + 20, x:x + 20] = True
    targets = Targets(
        labels=jnp.asarray(rng.randint(0, 80, (1, N)), jnp.int32),
        masks=jnp.asarray(masks),
        boxes=jnp.asarray(rng.rand(1, N, 4), jnp.float32),
        valid=jnp.asarray([[True, True, True, False, False]]),
    )
    out = model.apply(params, images, targets, train=True,
                      rngs={"dn": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)})
    Q = cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES
    K = cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES
    pad = cfg.MODEL.DN.NUM_DN * N
    assert out["pred_logits"].shape == (1, Q, K + 1)
    assert out["dn_out"] is not None
    assert out["dn_out"]["pred_logits"].shape == (1, pad, K + 1)
    assert out["dn_out"]["pred_masks"].shape == (1, pad, 16, 16)
    assert out["dn_out"]["dn_args"]["pad_size"] == pad
    assert len(out["dn_out"]["aux_outputs"]) == cfg.MODEL.MASK_FORMER.DEC_LAYERS - 1


def test_eval_forward_jits(small_model):
    cfg, model, params, images = small_model

    @jax.jit
    def fwd(p, im):
        return model.apply(p, im, None, train=False)

    out = fwd(params, images)
    assert np.isfinite(np.asarray(out["pred_logits"])).all()


def test_uint8_images_match_float32(small_model):
    """The loaders ship uint8 images (compact host transfers); the model
    upcasts on device. Forward must be IDENTICAL to the previous host
    behavior (uint8 decode -> astype(float32) before shipping)."""
    cfg, model, params, images = small_model
    img_u8 = np.asarray(images).astype(np.uint8)
    out_f = model.apply(params, jnp.asarray(img_u8, jnp.float32), None,
                        train=False)
    out_u = model.apply(params, jnp.asarray(img_u8), None, train=False)
    np.testing.assert_array_equal(np.asarray(out_f["pred_logits"]),
                                  np.asarray(out_u["pred_logits"]))
    np.testing.assert_array_equal(np.asarray(out_f["pred_masks"]),
                                  np.asarray(out_u["pred_masks"]))
