"""Distributed evaluation: device-sharded eval == single-device eval, and
evaluator-state merge == single accumulation (the multi-process gather path,
reference train_net.py:84-86 comm.gather / d2 rank-sharded
inference_on_dataset)."""

import json

import cv2
import numpy as np
import pytest

import jax

from mp_former_tpu.config import (add_deeplab_config, add_maskformer2_config,
                                  get_cfg)
from mp_former_tpu.data.catalog import DatasetCatalog
from mp_former_tpu.data.datasets.coco import register_coco_instances
from mp_former_tpu.engine.eval_loop import run_evaluation
from mp_former_tpu.evaluation.build import build_evaluator
from mp_former_tpu.models import build_model
from mp_former_tpu.parallel.mesh import create_mesh


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco_dist")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(7)
    images, annotations = [], []
    aid = 1
    # 6 images, two shapes (exercises partial-group flush: 6 = 4 + 2 pad on
    # a 4-device mesh when all shapes match; mixed shapes split groups)
    shapes = [(96, 128), (96, 128), (128, 96), (96, 128), (128, 96), (96, 128)]
    for i, (h, w) in enumerate(shapes):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        rects = [(10, 10, 40, 50), (50, 30, 90, 80)]
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
    jf = root / "instances.json"
    jf.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": 1, "name": "red"}, {"id": 2, "name": "green"}],
    }))
    name = "synthetic_coco_dist_eval"
    register_coco_instances(name, str(jf), str(img_dir))
    return name


def _cfg(name):
    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    cfg.merge_from_list([
        "MODEL.RESNETS.OUT_FEATURES", "['res2','res3','res4','res5']",
        "MODEL.SEM_SEG_HEAD.NAME", "MaskFormerHead",
        "MODEL.SEM_SEG_HEAD.IN_FEATURES", "['res2','res3','res4','res5']",
        "MODEL.SEM_SEG_HEAD.PIXEL_DECODER_NAME", "MSDeformAttnPixelDecoder",
        "MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS", "1",
        "MODEL.SEM_SEG_HEAD.NUM_CLASSES", "2",
        "MODEL.SEM_SEG_HEAD.CONVS_DIM", "32",
        "MODEL.SEM_SEG_HEAD.MASK_DIM", "32",
        "MODEL.MASK_FORMER.TRANSFORMER_IN_FEATURE",
        "multi_scale_pixel_decoder",
        "MODEL.MASK_FORMER.HIDDEN_DIM", "32",
        "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "8",
        "MODEL.MASK_FORMER.NHEADS", "4",
        "MODEL.MASK_FORMER.DIM_FEEDFORWARD", "64",
        "MODEL.MASK_FORMER.DEC_LAYERS", "4",
        "MODEL.MASK_FORMER.DROPOUT", "0.0",
        "MODEL.MASK_FORMER.TEST.INSTANCE_ON", "True",
        "INPUT.MIN_SIZE_TEST", "64",
        "INPUT.MAX_SIZE_TEST", "96",
        "TEST.DETECTIONS_PER_IMAGE", "8",
        "DATASETS.TEST", f"('{name}',)",
        "TPU.MESH_SHAPE", "[4]",
    ])
    return cfg


def _flatten(d, prefix=""):
    out = {}
    for k, v in d.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + str(k) + "/"))
        elif isinstance(v, (int, float, np.floating)):
            out[prefix + str(k)] = float(v)
    return out


def test_sharded_eval_matches_single_device(dataset):
    cfg = _cfg(dataset)
    cfg.freeze()
    model = build_model(cfg)
    import jax.numpy as jnp

    dummy = jnp.zeros((1, 96, 96, 3), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, dummy, None,
                        train=False)

    single = run_evaluation(cfg, model, params, dataset)
    mesh = create_mesh(cfg, jax.devices()[:4])
    sharded = run_evaluation(cfg, model, params, dataset, mesh=mesh)

    fs, fd = _flatten(single), _flatten(sharded)
    assert set(fs) == set(fd)
    for k in fs:
        if np.isnan(fs[k]) and np.isnan(fd[k]):
            continue
        np.testing.assert_allclose(fd[k], fs[k], rtol=1e-5, atol=1e-7,
                                   err_msg=k)


def test_evaluator_set_merge_matches_single(dataset):
    """Two evaluator sets over disjoint record halves, merged, equal one set
    over all records — the multi-process gather path's core invariant."""
    cfg = _cfg(dataset)
    cfg.freeze()
    records = DatasetCatalog.get(dataset)
    rng = np.random.RandomState(0)

    def fake_outputs(rec):
        h, w = rec["height"], rec["width"]
        r = np.random.RandomState(rec["image_id"])
        masks = np.zeros((3, h, w), bool)
        for i in range(3):
            y, x = r.randint(0, h - 20), r.randint(0, w - 20)
            masks[i, y:y + 20, x:x + 20] = True
        return {"instance": (r.rand(3).astype(np.float32),
                             r.randint(0, 2, 3), masks)}

    full = build_evaluator(cfg, dataset, records)
    full.reset()
    for rec in records:
        full.process(rec, fake_outputs(rec))

    a = build_evaluator(cfg, dataset, records)
    b = build_evaluator(cfg, dataset, records)
    a.reset(), b.reset()
    for rec in records[0::2]:
        a.process(rec, fake_outputs(rec))
    for rec in records[1::2]:
        b.process(rec, fake_outputs(rec))
    a.merge_from(b)

    fa, ff = _flatten(a.evaluate()), _flatten(full.evaluate())
    assert set(fa) == set(ff)
    for k in ff:
        if np.isnan(ff[k]) and np.isnan(fa[k]):
            continue
        np.testing.assert_allclose(fa[k], ff[k], rtol=1e-9, err_msg=k)


def test_all_gather_objects_single_process():
    from mp_former_tpu.parallel.dist import all_gather_objects

    obj = {"x": np.arange(3), "y": "s"}
    out = all_gather_objects(obj)
    assert len(out) == 1 and out[0]["y"] == "s"
