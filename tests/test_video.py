"""Video stack: forward shapes + tube criterion + YTVIS evaluator."""

import numpy as np

import jax
import jax.numpy as jnp

from mp_former_tpu.config import get_cfg, add_deeplab_config, add_maskformer2_config, add_maskformer2_video_config
from mp_former_tpu.models import build_model
from mp_former_tpu.video import VideoTargets
from mp_former_tpu.video.criterion import build_video_criterion


def _video_cfg():
    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    add_maskformer2_video_config(cfg)
    cfg.merge_from_list([
        "MODEL.META_ARCHITECTURE", "VideoMaskFormer",
        "MODEL.RESNETS.OUT_FEATURES", "['res2','res3','res4','res5']",
        "MODEL.RESNETS.STRIDE_IN_1X1", "False",
        "MODEL.SEM_SEG_HEAD.NAME", "MaskFormerHead",
        "MODEL.SEM_SEG_HEAD.IN_FEATURES", "['res2','res3','res4','res5']",
        "MODEL.SEM_SEG_HEAD.PIXEL_DECODER_NAME", "MSDeformAttnPixelDecoder",
        "MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS", "1",
        "MODEL.SEM_SEG_HEAD.NUM_CLASSES", "5",
        "MODEL.SEM_SEG_HEAD.CONVS_DIM", "32",
        "MODEL.SEM_SEG_HEAD.MASK_DIM", "32",
        "MODEL.MASK_FORMER.TRANSFORMER_IN_FEATURE", "multi_scale_pixel_decoder",
        "MODEL.MASK_FORMER.TRANSFORMER_DECODER_NAME",
        "VideoMultiScaleMaskedTransformerDecoder",
        "MODEL.MASK_FORMER.HIDDEN_DIM", "32",
        "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "6",
        "MODEL.MASK_FORMER.NHEADS", "4",
        "MODEL.MASK_FORMER.DIM_FEEDFORWARD", "64",
        "MODEL.MASK_FORMER.DEC_LAYERS", "4",
        "MODEL.MASK_FORMER.TRAIN_NUM_POINTS", "128",
        "INPUT.SAMPLING_FRAME_NUM", "2",
    ])
    return cfg


def test_video_forward_and_loss():
    cfg = _video_cfg()
    model = build_model(cfg)
    b, t, h, w = 1, 2, 64, 64
    rng = np.random.RandomState(0)
    clips = jnp.asarray(rng.rand(b, t, h, w, 3).astype(np.float32) * 255)
    params = model.init({"params": jax.random.PRNGKey(0)}, clips, None, train=False)
    out = model.apply(params, clips, None, train=True,
                      rngs={"dropout": jax.random.PRNGKey(5)})
    assert out["pred_logits"].shape == (b, 6, 6)
    assert out["pred_masks"].shape == (b, 6, t, 16, 16)
    assert len(out["aux_outputs"]) == 3

    n = 4
    masks = np.zeros((b, n, t, h, w), bool)
    masks[:, 0, :, 8:40, 8:40] = True
    masks[:, 1, 0, 30:60, 30:60] = True
    targets = VideoTargets(
        labels=jnp.asarray(rng.randint(0, 5, (b, n)), jnp.int32),
        masks=jnp.asarray(masks),
        valid=jnp.asarray([[True, True, False, False]]),
    )
    criterion = build_video_criterion(cfg)
    losses = criterion(out, targets, jax.random.PRNGKey(1))
    assert np.isfinite(float(criterion.weighted_total(losses)))
    for k in ("loss_ce", "loss_mask", "loss_dice", "loss_ce_2"):
        assert k in losses


def test_ytvis_evaluator_perfect():
    from mp_former_tpu.video.ytvis_eval import YTVISEvaluator

    t, h, w = 2, 32, 32
    tube = np.zeros((t, h, w), bool)
    tube[:, 4:16, 4:16] = True
    rec = {
        "video_id": 1, "height": h, "width": w, "length": t,
        "annotations": [{
            "id": 1, "category_id": 0, "iscrowd": 0,
            "segmentations": [[[4, 4, 16, 4, 16, 16, 4, 16]]] * t,
            "areas": [144, 144],
        }],
    }
    ev = YTVISEvaluator([rec])
    # predict exactly the GT rasterization
    from mp_former_tpu.video.ytvis import _seg_to_mask
    gt_m = _seg_to_mask([[4, 4, 16, 4, 16, 16, 4, 16]], h, w)
    pred = np.stack([gt_m, gt_m])
    ev.process(1, np.array([0.9]), np.array([0]), [pred])
    res = ev.evaluate()
    assert abs(res["segm"]["AP"] - 100.0) < 1e-6
