"""End-to-end integration: synthetic COCO dataset on disk -> mapper/loader ->
2 train steps -> eval loop -> AP evaluator. Exercises the full stack the way
train_net.py does."""

import json
import os

import cv2
import numpy as np
import pytest

import jax

from mp_former_tpu.config import get_cfg, add_deeplab_config, add_maskformer2_config
from mp_former_tpu.data.catalog import DatasetCatalog
from mp_former_tpu.data.datasets.coco import register_coco_instances
from mp_former_tpu.data.loader import build_train_loader
from mp_former_tpu.engine.eval_loop import inference_on_dataset
from mp_former_tpu.evaluation.evaluators import COCOEvaluator
from mp_former_tpu.models import build_model


@pytest.fixture(scope="module")
def synthetic_coco(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    for i in range(4):
        h, w = 96, 128
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        # draw 2 colored rectangles as "objects"
        rects = [(10, 10, 40, 50), (60, 30, 110, 80)]
        for ri, (x0, y0, x1, y1) in enumerate(rects):
            img[y0:y1, x0:x1] = (255, 0, 0) if ri == 0 else (0, 255, 0)
            annotations.append({
                "id": aid, "image_id": i, "category_id": ri + 1,
                "bbox": [x0, y0, x1 - x0, y1 - y0],
                "area": (x1 - x0) * (y1 - y0), "iscrowd": 0,
                "segmentation": [[x0, y0, x1, y0, x1, y1, x0, y1]],
            })
            aid += 1
        fn = f"{i:06d}.jpg"
        cv2.imwrite(str(img_dir / fn), img)
        images.append({"id": i, "file_name": fn, "height": h, "width": w})
    js = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "red"}, {"id": 2, "name": "green"}],
    }
    jf = root / "instances.json"
    jf.write_text(json.dumps(js))
    name = "synthetic_coco_test"
    register_coco_instances(name, str(jf), str(img_dir))
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
        "MODEL.MASK_FORMER.LB_NOISE_RATIO", "0.2",
        "MODEL.MASK_FORMER.HIDDEN_DIM", "32",
        "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "8",
        "MODEL.MASK_FORMER.NHEADS", "4",
        "MODEL.MASK_FORMER.DIM_FEEDFORWARD", "64",
        "MODEL.MASK_FORMER.DEC_LAYERS", "4",
        "MODEL.MASK_FORMER.DROPOUT", "0.0",
        "MODEL.MASK_FORMER.TRAIN_NUM_POINTS", "256",
        "MODEL.MASK_FORMER.TEST.INSTANCE_ON", "True",
        "MODEL.DN.NUM_DN", "1",
        "MODEL.DN.NOISE_SCALE", "0.0",
        "INPUT.IMAGE_SIZE", "64",
        "INPUT.DATASET_MAPPER_NAME", "coco_instance_lsj",
        "INPUT.MIN_SIZE_TEST", "64",
        "INPUT.MAX_SIZE_TEST", "96",
        "SOLVER.IMS_PER_BATCH", "2",
        "SOLVER.MAX_ITER", "2",
        "SOLVER.BASE_LR", "0.0001",
        "TPU.MAX_INSTANCES", "8",
        "DATASETS.TRAIN", f"('{name}',)",
        "DATASETS.TEST", f"('{name}',)",
        "TEST.DETECTIONS_PER_IMAGE", "8",
        "DATALOADER.NUM_WORKERS", "2",
        "TPU.MESH_SHAPE", "[2]",
    ])
    return cfg


def test_train_loader_and_steps(synthetic_coco, tmp_path):
    cfg = _tiny_cfg(synthetic_coco)
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.freeze()

    from mp_former_tpu.engine.trainer import Trainer

    loader = build_train_loader(cfg)
    trainer = Trainer(cfg, loader)
    trainer.train(0)
    loader.close()
    metrics_file = os.path.join(cfg.OUTPUT_DIR, "metrics.json")
    assert os.path.exists(metrics_file)
    m = json.loads(open(metrics_file).readline())
    assert np.isfinite(m["total_loss"])
    # checkpoint written at end of training
    assert trainer._manager().latest_step() == cfg.SOLVER.MAX_ITER


def test_eval_loop(synthetic_coco):
    cfg = _tiny_cfg(synthetic_coco)
    cfg.freeze()
    model = build_model(cfg)
    records = DatasetCatalog.get(synthetic_coco)
    import jax.numpy as jnp

    dummy = jnp.zeros((1, 96, 96, 3), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, dummy, None, train=False)
    evaluator = COCOEvaluator(records)
    results = inference_on_dataset(cfg, model, params, records, evaluator,
                                   max_images=2)
    assert "segm" in results and "AP" in results["segm"]


def test_train_step_geometric_dn(synthetic_coco, tmp_path):
    """One optimizer step with a geometric DN mode (v7 'shift_scale')
    through the full Trainer path — locks the v6-v9 modes into training."""
    cfg = _tiny_cfg(synthetic_coco)
    cfg.MODEL.MASK_FORMER.DN_MODE = "shift_scale"
    cfg.MODEL.DN.NOISE_SCALE = 0.3
    cfg.SOLVER.MAX_ITER = 1
    cfg.OUTPUT_DIR = str(tmp_path / "out_geo")
    cfg.freeze()

    from mp_former_tpu.engine.trainer import Trainer

    loader = build_train_loader(cfg)
    trainer = Trainer(cfg, loader)
    trainer.train(0)
    loader.close()
    m = json.loads(open(os.path.join(cfg.OUTPUT_DIR,
                                     "metrics.json")).readline())
    assert np.isfinite(m["total_loss"])
    assert any(k.startswith("loss_mask_dn") or k == "loss_mask_dn"
               or k.endswith("_dn") for k in m), sorted(m)[:10]
