"""bf16 (AMP-equivalent) mode: outputs close to fp32, losses finite."""

import numpy as np

import jax
import jax.numpy as jnp

from mp_former_tpu.config import get_cfg, add_deeplab_config, add_maskformer2_config
from mp_former_tpu.models import build_model


def _cfg(dtype):
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
        "MODEL.MASK_FORMER.TRANSFORMER_DECODER_NAME", "MultiScaleMaskedTransformerDecoder",
        "MODEL.MASK_FORMER.HIDDEN_DIM", "32",
        "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "6",
        "MODEL.MASK_FORMER.NHEADS", "4",
        "MODEL.MASK_FORMER.DIM_FEEDFORWARD", "64",
        "MODEL.MASK_FORMER.DEC_LAYERS", "3",
        "TPU.COMPUTE_DTYPE", dtype,
    ])
    return cfg


def test_bf16_forward_close_to_fp32():
    images = jnp.asarray(
        np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32) * 255)

    m32 = build_model(_cfg("float32"))
    params = m32.init({"params": jax.random.PRNGKey(0)}, images, None,
                      train=False)
    out32 = m32.apply(params, images, None, train=False)

    m16 = build_model(_cfg("bfloat16"))
    out16 = m16.apply(params, images, None, train=False)

    a = np.asarray(out32["pred_logits"], np.float32)
    b = np.asarray(out16["pred_logits"], np.float32)
    assert np.isfinite(b).all()
    # bf16 has ~2-3 significant digits; after 4 decoder layers expect rough
    # agreement, not bit equality
    denom = np.maximum(np.abs(a).max(), 1.0)
    assert np.abs(a - b).max() / denom < 0.15, np.abs(a - b).max()
