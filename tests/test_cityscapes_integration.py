"""End-to-end cityscapes evaluation through run_evaluation: synthetic
cityscapes directory layout -> registration -> EvalMapper -> tiny model ->
CityscapesInstance/SemSeg evaluators (reference --eval-only path for
cityscapes_fine_* datasets, train_net.py:189-209)."""

import json
import os

import numpy as np
import pytest

CAR, ROAD, SKY = 26, 7, 23


@pytest.fixture
def cityscapes_root(tmp_path):
    import cv2

    root = tmp_path
    for split in ("val",):
        img_dir = root / "cityscapes" / "leftImg8bit" / split / "tcity"
        gt_dir = root / "cityscapes" / "gtFine" / split / "tcity"
        img_dir.mkdir(parents=True)
        gt_dir.mkdir(parents=True)
        rng = np.random.RandomState(0)
        for i in range(2):
            stem = f"tcity_{i:06d}_000019"
            h, w = 64, 128
            img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(img_dir / f"{stem}_leftImg8bit.png"), img)
            # labelIds: road background, sky band, one car
            labels = np.full((h, w), ROAD, np.uint8)
            labels[:10] = SKY
            labels[20:40, 30:60] = CAR
            cv2.imwrite(str(gt_dir / f"{stem}_gtFine_labelIds.png"), labels)
            inst = labels.astype(np.uint16).copy()
            inst[20:40, 30:60] = CAR * 1000  # one car instance
            cv2.imwrite(str(gt_dir / f"{stem}_gtFine_instanceIds.png"), inst)
            # trainIds for the semantic registration
            lut = np.full(256, 255, np.uint8)
            lut[ROAD], lut[SKY], lut[CAR] = 0, 10, 13
            cv2.imwrite(str(gt_dir / f"{stem}_gtFine_labelTrainIds.png"),
                        lut[labels])
            (gt_dir / f"{stem}_gtFine_polygons.json").write_text(json.dumps({
                "imgHeight": h, "imgWidth": w,
                "objects": [{"label": "car",
                             "polygon": [[30, 20], [59, 20], [59, 39],
                                         [30, 39]]}],
            }))
    return str(root)


def _tiny_cfg(num_classes):
    from mp_former_tpu.config import (add_deeplab_config,
                                      add_maskformer2_config, get_cfg)

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
        "MODEL.SEM_SEG_HEAD.NUM_CLASSES", str(num_classes),
        "MODEL.SEM_SEG_HEAD.CONVS_DIM", "32",
        "MODEL.SEM_SEG_HEAD.MASK_DIM", "32",
        "MODEL.MASK_FORMER.TRANSFORMER_IN_FEATURE", "multi_scale_pixel_decoder",
        "MODEL.MASK_FORMER.TRANSFORMER_DECODER_NAME",
        "MultiScaleMaskedTransformerDecoderMaskDN",
        "MODEL.MASK_FORMER.HIDDEN_DIM", "32",
        "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "6",
        "MODEL.MASK_FORMER.NHEADS", "4",
        "MODEL.MASK_FORMER.DIM_FEEDFORWARD", "64",
        "MODEL.MASK_FORMER.DEC_LAYERS", "3",
        "MODEL.MASK_FORMER.DROPOUT", "0.0",
        "INPUT.MIN_SIZE_TEST", "64",
        "INPUT.MAX_SIZE_TEST", "128",
        "TEST.DETECTIONS_PER_IMAGE", "6",
    ])
    return cfg


def _registered(root):
    """(Re-)register cityscapes under this root in a fresh catalog scope."""
    from mp_former_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from mp_former_tpu.data.datasets.register_all import (
        register_cityscapes_instance, register_sem_seg)
    from mp_former_tpu.data.datasets.cityscapes_labels import EVAL_LABELS

    img = os.path.join(root, "cityscapes/leftImg8bit/val")
    gt = os.path.join(root, "cityscapes/gtFine/val")
    inst_name = "test_cs_instance_val"
    sem_name = "test_cs_sem_val"
    if inst_name not in DatasetCatalog:
        register_cityscapes_instance(inst_name, img, gt)
        register_sem_seg(
            sem_name, img, gt, [l.name for l in EVAL_LABELS],
            image_ext="_leftImg8bit.png",
            gt_ext="_gtFine_labelTrainIds.png",
            evaluator_type="cityscapes_sem_seg")
    return inst_name, sem_name


def test_cityscapes_instance_eval_end_to_end(cityscapes_root):
    import jax
    import jax.numpy as jnp

    from mp_former_tpu.engine.eval_loop import run_evaluation
    from mp_former_tpu.models import build_model

    inst_name, _ = _registered(cityscapes_root)
    cfg = _tiny_cfg(8)  # 8 cityscapes thing classes
    model = build_model(cfg)
    params = jax.jit(lambda k, im: model.init(
        {"params": k}, im, None, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    results = run_evaluation(cfg, model, params, inst_name)
    # untrained model: protocol runs to completion and reports the schema
    assert "segm" in results
    assert "AP" in results["segm"]
    assert "AP50" in results["segm"]
    assert "AP-car" in results["segm"]


def test_cityscapes_semseg_eval_end_to_end(cityscapes_root):
    import jax
    import jax.numpy as jnp

    from mp_former_tpu.engine.eval_loop import run_evaluation
    from mp_former_tpu.models import build_model

    _, sem_name = _registered(cityscapes_root)
    cfg = _tiny_cfg(19)
    cfg.merge_from_list(["MODEL.MASK_FORMER.TEST.SEMANTIC_ON", "True",
                         "MODEL.MASK_FORMER.TEST.INSTANCE_ON", "False"])
    model = build_model(cfg)
    params = jax.jit(lambda k, im: model.init(
        {"params": k}, im, None, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    results = run_evaluation(cfg, model, params, sem_name)
    sem = results["sem_seg"]
    for k in ("IoU", "iIoU", "IoU_sup", "iIoU_sup"):
        assert k in sem
    assert np.isfinite(sem["IoU"])
