"""End-to-end coco_panoptic_seg evaluation through run_evaluation: one
forward feeds PQ + instance AP + semantic mIoU (reference build_evaluator
for evaluator_type 'coco_panoptic_seg', train_net.py:167-182)."""

import json
import os

import numpy as np
import pytest


def _id2rgb(ids: np.ndarray) -> np.ndarray:
    rgb = np.zeros(ids.shape + (3,), np.uint8)
    rgb[..., 0] = ids % 256
    rgb[..., 1] = (ids // 256) % 256
    rgb[..., 2] = ids // (256 * 256)
    return rgb


@pytest.fixture
def panoptic_root(tmp_path):
    import cv2

    root = tmp_path
    img_dir = root / "coco" / "val2017"
    pan_dir = root / "coco" / "panoptic_val2017"
    sem_dir = root / "coco" / "panoptic_semseg_val2017"
    ann_dir = root / "coco" / "annotations"
    for d in (img_dir, pan_dir, sem_dir, ann_dir):
        d.mkdir(parents=True)
    rng = np.random.RandomState(0)
    images, annotations = [], []
    h, w = 64, 96
    for i in range(2):
        fn = f"{i + 1:012d}"
        cv2.imwrite(str(img_dir / f"{fn}.jpg"),
                    (rng.rand(h, w, 3) * 255).astype(np.uint8))
        # two segments: thing id 7 (cat 1), stuff id 9 (cat 2)
        pan = np.zeros((h, w), np.int64)
        pan[:, : w // 2] = 7
        pan[:, w // 2:] = 9
        cv2.imwrite(str(pan_dir / f"{fn}.png"),
                    cv2.cvtColor(_id2rgb(pan), cv2.COLOR_RGB2BGR))
        sem = np.zeros((h, w), np.uint8)
        sem[:, w // 2:] = 1  # contiguous stuff class index
        cv2.imwrite(str(sem_dir / f"{fn}.png"), sem)
        images.append({"id": i + 1, "file_name": f"{fn}.png",
                       "height": h, "width": w})
        annotations.append({
            "image_id": i + 1, "file_name": f"{fn}.png",
            "segments_info": [
                {"id": 7, "category_id": 1, "iscrowd": 0, "area": h * w // 2},
                {"id": 9, "category_id": 2, "iscrowd": 0, "area": h * w // 2},
            ],
        })
    json.dump({
        "images": images, "annotations": annotations,
        "categories": [
            {"id": 1, "name": "thing-a", "isthing": 1},
            {"id": 2, "name": "stuff-b", "isthing": 0},
        ],
    }, open(ann_dir / "panoptic_val2017.json", "w"))
    # instances json for the instance-AP leg
    json.dump({
        "images": [dict(im, file_name=im["file_name"].replace(".png", ".jpg"))
                   for im in images],
        "annotations": [
            {"id": i + 1, "image_id": i + 1, "category_id": 1,
             "bbox": [0, 0, w // 2, h], "area": h * w / 2, "iscrowd": 0,
             "segmentation": [[0, 0, w / 2, 0, w / 2, h, 0, h]]}
            for i in range(2)
        ],
        "categories": [{"id": 1, "name": "thing-a"}],
    }, open(ann_dir / "instances_val2017.json", "w"))
    return str(root)


def test_panoptic_multi_task_eval(panoptic_root):
    import jax
    import jax.numpy as jnp

    from mp_former_tpu.config import (add_deeplab_config,
                                      add_maskformer2_config, get_cfg)
    from mp_former_tpu.data.catalog import DatasetCatalog
    from mp_former_tpu.data.datasets.register_all import register_coco_panoptic
    from mp_former_tpu.engine.eval_loop import run_evaluation
    from mp_former_tpu.models import build_model

    name = "test_pan_val"
    if name not in DatasetCatalog:
        register_coco_panoptic(
            name,
            os.path.join(panoptic_root, "coco/annotations/panoptic_val2017.json"),
            os.path.join(panoptic_root, "coco/val2017"),
            os.path.join(panoptic_root, "coco/panoptic_val2017"),
            semseg_root=os.path.join(panoptic_root, "coco/panoptic_semseg_val2017"),
            instances_json=os.path.join(
                panoptic_root, "coco/annotations/instances_val2017.json"),
            ignore_label=255)

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
        "MODEL.MASK_FORMER.HIDDEN_DIM", "32",
        "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "6",
        "MODEL.MASK_FORMER.NHEADS", "4",
        "MODEL.MASK_FORMER.DIM_FEEDFORWARD", "64",
        "MODEL.MASK_FORMER.DEC_LAYERS", "3",
        "MODEL.MASK_FORMER.DROPOUT", "0.0",
        "MODEL.MASK_FORMER.TEST.SEMANTIC_ON", "True",
        "MODEL.MASK_FORMER.TEST.INSTANCE_ON", "True",
        "MODEL.MASK_FORMER.TEST.PANOPTIC_ON", "True",
        "MODEL.MASK_FORMER.TEST.OBJECT_MASK_THRESHOLD", "0.0",
        "INPUT.MIN_SIZE_TEST", "64",
        "INPUT.MAX_SIZE_TEST", "96",
        "TEST.DETECTIONS_PER_IMAGE", "6",
    ])
    model = build_model(cfg)
    params = jax.jit(lambda k, im: model.init(
        {"params": k}, im, None, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    results = run_evaluation(cfg, model, params, name)
    # all three evaluator families report their schema from ONE forward
    assert "panoptic_seg" in results and "All" in results["panoptic_seg"]
    assert "segm" in results and "AP" in results["segm"]
    assert "sem_seg" in results and "mIoU" in results["sem_seg"]
