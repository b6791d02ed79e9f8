"""SemanticSegmentorWithTTA smoke test."""

import numpy as np

import jax
import jax.numpy as jnp

from mp_former_tpu.config import get_cfg, add_deeplab_config, add_maskformer2_config
from mp_former_tpu.models import build_model
from mp_former_tpu.test_time_augmentation import SemanticSegmentorWithTTA


def test_tta_averages_scales():
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
        "MODEL.SEM_SEG_HEAD.NUM_CLASSES", "4",
        "MODEL.SEM_SEG_HEAD.CONVS_DIM", "32",
        "MODEL.SEM_SEG_HEAD.MASK_DIM", "32",
        "MODEL.MASK_FORMER.TRANSFORMER_IN_FEATURE", "multi_scale_pixel_decoder",
        "MODEL.MASK_FORMER.TRANSFORMER_DECODER_NAME", "MultiScaleMaskedTransformerDecoder",
        "MODEL.MASK_FORMER.HIDDEN_DIM", "32",
        "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "6",
        "MODEL.MASK_FORMER.NHEADS", "4",
        "MODEL.MASK_FORMER.DIM_FEEDFORWARD", "64",
        "MODEL.MASK_FORMER.DEC_LAYERS", "3",
    ])
    model = build_model(cfg)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 64, 64, 3)), None, train=False)
    tta = SemanticSegmentorWithTTA(cfg, model, params,
                                   min_sizes=[48, 64], max_size=96, flip=True)
    img = (np.random.RandomState(0).rand(50, 70, 3) * 255).astype(np.uint8)
    sem = tta(img)
    assert sem.shape == (4, 50, 70)
    assert np.isfinite(sem).all()
    assert sem.min() >= 0  # averaged probabilities
