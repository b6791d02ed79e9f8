"""Swin-backbone + full head composition from our config file."""

import numpy as np

import jax
import jax.numpy as jnp

from mp_former_tpu.config import get_cfg, add_deeplab_config, add_maskformer2_config
from mp_former_tpu.models import build_model


def test_swin_tiny_model_builds_and_runs():
    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    cfg.merge_from_file(
        "configs/coco/instance-segmentation/swin/maskformer2_swin_large_IN21k_384_bs16_100ep.yaml")
    # shrink to a test-size swin while keeping the real composition path
    cfg.merge_from_list([
        "MODEL.SWIN.EMBED_DIM", "16",
        "MODEL.SWIN.DEPTHS", "[1, 1, 1, 1]",
        "MODEL.SWIN.NUM_HEADS", "[1, 2, 4, 8]",
        "MODEL.SWIN.WINDOW_SIZE", "4",
        "MODEL.SWIN.DROP_PATH_RATE", "0.0",
        "MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS", "1",
        "MODEL.SEM_SEG_HEAD.CONVS_DIM", "32",
        "MODEL.SEM_SEG_HEAD.MASK_DIM", "32",
        "MODEL.MASK_FORMER.HIDDEN_DIM", "32",
        "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "7",
        "MODEL.MASK_FORMER.NHEADS", "4",
        "MODEL.MASK_FORMER.DIM_FEEDFORWARD", "64",
        "MODEL.MASK_FORMER.DEC_LAYERS", "4",
    ])
    model = build_model(cfg)
    assert cfg.MODEL.BACKBONE.NAME == "D2SwinTransformer"
    assert cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES == 7

    images = jnp.asarray(
        np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32) * 255)
    params = model.init({"params": jax.random.PRNGKey(0)}, images, None,
                        train=False)
    out = model.apply(params, images, None, train=False)
    assert out["pred_logits"].shape == (1, 7, 81)
    assert out["pred_masks"].shape == (1, 7, 16, 16)
    assert np.isfinite(np.asarray(out["pred_masks"])).all()
