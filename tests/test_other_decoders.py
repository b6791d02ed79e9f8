"""Smoke tests for the non-default component combinations: FPN pixel
decoders + StandardTransformerDecoder (original MaskFormer paths)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mp_former_tpu.config import get_cfg, add_deeplab_config, add_maskformer2_config
from mp_former_tpu.models import build_model


def _cfg(opts):
    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    cfg.merge_from_list(list(opts))
    return cfg


BASE = [
    "MODEL.RESNETS.OUT_FEATURES", "['res2','res3','res4','res5']",
    "MODEL.RESNETS.STRIDE_IN_1X1", "False",
    "MODEL.SEM_SEG_HEAD.NAME", "MaskFormerHead",
    "MODEL.SEM_SEG_HEAD.IN_FEATURES", "['res2','res3','res4','res5']",
    "MODEL.SEM_SEG_HEAD.NUM_CLASSES", "19",
    "MODEL.SEM_SEG_HEAD.CONVS_DIM", "32",
    "MODEL.SEM_SEG_HEAD.MASK_DIM", "32",
    "MODEL.MASK_FORMER.HIDDEN_DIM", "32",
    "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "5",
    "MODEL.MASK_FORMER.NHEADS", "4",
    "MODEL.MASK_FORMER.DIM_FEEDFORWARD", "64",
    "MODEL.MASK_FORMER.DEC_LAYERS", "3",
    "MODEL.MASK_FORMER.DROPOUT", "0.0",
]


@pytest.mark.parametrize("pixel_decoder,tx_in_feature,decoder", [
    ("BasePixelDecoder", "res5", "StandardTransformerDecoder"),
    ("TransformerEncoderPixelDecoder", "transformer_encoder", "StandardTransformerDecoder"),
    ("BasePixelDecoder", "multi_scale_pixel_decoder", "MultiScaleMaskedTransformerDecoder"),
])
def test_alternate_model_graphs(pixel_decoder, tx_in_feature, decoder):
    cfg = _cfg(BASE + [
        "MODEL.SEM_SEG_HEAD.PIXEL_DECODER_NAME", pixel_decoder,
        "MODEL.MASK_FORMER.TRANSFORMER_IN_FEATURE", tx_in_feature,
        "MODEL.MASK_FORMER.TRANSFORMER_DECODER_NAME", decoder,
        "MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS",
        "2" if pixel_decoder == "TransformerEncoderPixelDecoder" else "0",
    ])
    model = build_model(cfg)
    images = jnp.asarray(
        np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32) * 255)
    params = model.init({"params": jax.random.PRNGKey(0)}, images, None, train=False)
    out = model.apply(params, images, None, train=False)
    assert out["pred_logits"].shape == (1, 5, 20)
    assert out["pred_masks"].shape[0:2] == (1, 5)
    assert np.isfinite(np.asarray(out["pred_masks"])).all()
