"""End-to-end semantic-segmentation integration: sem_seg pngs on disk ->
register_sem_seg -> MaskFormerSemanticDatasetMapper -> 2 train steps ->
eval -> SemSeg evaluator mIoU (reference train_net.py sem_seg route:
build_train_loader 'mask_former_semantic' + build_evaluator 'sem_seg').
The per-task panoptic/instance integration twins live in
test_panoptic_integration.py / test_integration_train_eval.py."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mp_former_tpu.config import (add_deeplab_config, add_maskformer2_config,
                                  get_cfg)
from mp_former_tpu.data.catalog import DatasetCatalog
from mp_former_tpu.data.datasets.register_all import register_sem_seg
from mp_former_tpu.data.loader import build_train_loader
from mp_former_tpu.engine.eval_loop import run_evaluation
from mp_former_tpu.models import build_model


@pytest.fixture(scope="module")
def semseg_root(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("semseg")
    img_dir = root / "images"
    gt_dir = root / "annos"
    img_dir.mkdir()
    gt_dir.mkdir()
    rng = np.random.RandomState(0)
    h, w = 64, 96
    for i in range(4):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        sem = np.zeros((h, w), np.uint8)
        sem[:, w // 2:] = 1
        sem[: h // 4, : w // 4] = 255  # an ignore region
        img[:, w // 2:] = (0, 255, 0)
        cv2.imwrite(str(img_dir / f"{i:06d}.jpg"), img)
        cv2.imwrite(str(gt_dir / f"{i:06d}.png"), sem)
    name = "synthetic_semseg_test"
    if name not in DatasetCatalog:
        register_sem_seg(name, str(img_dir), str(gt_dir), ["left", "right"])
    return name


def _tiny_cfg(name):
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
        "MODEL.SEM_SEG_HEAD.NUM_CLASSES", "2",
        "MODEL.SEM_SEG_HEAD.CONVS_DIM", "32",
        "MODEL.SEM_SEG_HEAD.MASK_DIM", "32",
        "MODEL.MASK_FORMER.TRANSFORMER_IN_FEATURE", "multi_scale_pixel_decoder",
        "MODEL.MASK_FORMER.TRANSFORMER_DECODER_NAME",
        "MultiScaleMaskedTransformerDecoderMaskDN",
        "MODEL.MASK_FORMER.DN_MODE", "points",
        "MODEL.MASK_FORMER.ALL_LY_DN", "True",
        "MODEL.MASK_FORMER.HIDDEN_DIM", "32",
        "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "8",
        "MODEL.MASK_FORMER.NHEADS", "4",
        "MODEL.MASK_FORMER.DIM_FEEDFORWARD", "64",
        "MODEL.MASK_FORMER.DEC_LAYERS", "3",
        "MODEL.MASK_FORMER.DROPOUT", "0.0",
        "MODEL.MASK_FORMER.TRAIN_NUM_POINTS", "256",
        "MODEL.MASK_FORMER.TEST.SEMANTIC_ON", "True",
        "MODEL.MASK_FORMER.TEST.INSTANCE_ON", "False",
        "MODEL.DN.NUM_DN", "1",
        "MODEL.DN.NOISE_SCALE", "0.0",
        # reference semantic recipe shape: ResizeShortestEdge + absolute
        # crop + pad-to-SIZE_DIVISIBILITY (ade20k semantic yaml)
        "INPUT.DATASET_MAPPER_NAME", "mask_former_semantic",
        "INPUT.MIN_SIZE_TRAIN", "(64,)",
        "INPUT.MAX_SIZE_TRAIN", "96",
        "INPUT.CROP.ENABLED", "True",
        "INPUT.CROP.TYPE", "absolute",
        "INPUT.CROP.SIZE", "(64, 64)",
        "INPUT.SIZE_DIVISIBILITY", "64",
        "INPUT.COLOR_AUG_SSD", "True",
        "INPUT.MIN_SIZE_TEST", "64",
        "INPUT.MAX_SIZE_TEST", "96",
        "SOLVER.IMS_PER_BATCH", "2",
        "SOLVER.MAX_ITER", "2",
        "TPU.MAX_INSTANCES", "8",
        "DATASETS.TRAIN", f"('{name}',)",
        "DATASETS.TEST", f"('{name}',)",
        "DATALOADER.NUM_WORKERS", "2",
        "TPU.MESH_SHAPE", "[2]",
    ])
    return cfg


def test_semantic_train_steps(semseg_root, tmp_path):
    cfg = _tiny_cfg(semseg_root)
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.freeze()

    from mp_former_tpu.engine.trainer import Trainer

    loader = build_train_loader(cfg)
    trainer = Trainer(cfg, loader)
    trainer.train(0)
    loader.close()
    m = json.loads(
        open(os.path.join(cfg.OUTPUT_DIR, "metrics.json")).readline())
    assert np.isfinite(m["total_loss"])
    assert trainer._manager().latest_step() == cfg.SOLVER.MAX_ITER


def test_semantic_eval(semseg_root):
    cfg = _tiny_cfg(semseg_root)
    cfg.freeze()
    model = build_model(cfg)
    params = jax.jit(lambda k, im: model.init(
        {"params": k}, im, None, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    results = run_evaluation(cfg, model, params, semseg_root, max_images=2)
    assert "sem_seg" in results
    for k in ("mIoU", "fwIoU", "mACC", "pACC"):
        assert np.isfinite(results["sem_seg"][k])
