"""End-to-end AP oracle at FLAGSHIP eval resolution (VERDICT round-4 weak #4).

tests/test_e2e_ap_oracle.py runs the full flagship model at 96-128 px
originals with TOPK=10; this test runs the SAME torch-pipeline-vs-
run_evaluation comparison at the headline eval geometry
(reference eval.sh:10-16 / Base-COCO-InstanceSegmentation.yaml):

  * INPUT.MIN_SIZE_TEST 800 / MAX_SIZE_TEST 1333 (the reference
    ResizeShortestEdge eval), originals 800-1333 px,
  * TEST.DETECTIONS_PER_IMAGE 100 (Q*K topk at its real size, tie handling),
  * diverse original sizes across TPU.EVAL_STREAM groups so the fused-stream
    under-fill delegation executes both branches (engine/eval_loop.py
    flush_fused: a filled same-size group runs the fused scan program, a
    sparse group delegates to the per-image path).

Full-width flagship model (R50 replica, 100 queries, 9 decoder layers,
80-class head); a few images keep the single-core CPU runtime tolerable.
"""

import json

import cv2
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from mp_former_tpu.data.catalog import DatasetCatalog
from mp_former_tpu.data.datasets.coco import register_coco_instances
from mp_former_tpu.engine.checkpoint_import import convert_maskformer_state_dict
from mp_former_tpu.engine.eval_loop import (EvalMapper, _eval_forward,
                                            postprocess_instance,
                                            run_evaluation)
from mp_former_tpu.models import build_model

from oracle_cocoeval import COCOevalOracle
from test_e2e_ap_oracle import _masks_to_polygons
from test_full_model_parity import TorchMPFormer, _jax_cfg
from test_e2e_ap_oracle import _torch_pipeline

TOPK = 100  # TEST.DETECTIONS_PER_IMAGE at its reference value
# three images share (1024, 1024) -> a filled fused-stream group; the other
# two are unique sizes -> under-filled groups delegated to per-image flush
SIZES = [(1024, 1024), (1024, 1024), (1024, 1024), (800, 1216), (900, 1333)]


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    torch.manual_seed(0)
    tmodel = TorchMPFormer().eval()
    for layer in tmodel.sem_seg_head.pixel_decoder.transformer.encoder.layers:
        lin = layer.self_attn.sampling_offsets
        torch.nn.init.uniform_(lin.weight, -0.01, 0.01)
        torch.nn.init.uniform_(lin.bias, -2.0, 2.0)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = {"params": convert_maskformer_state_dict(sd)}

    cfg = _jax_cfg()
    cfg.merge_from_list([
        "MODEL.MASK_FORMER.TEST.INSTANCE_ON", "True",
        "MODEL.MASK_FORMER.TEST.SEMANTIC_ON", "False",
        "INPUT.MIN_SIZE_TEST", "800",
        "INPUT.MAX_SIZE_TEST", "1333",
        "TEST.DETECTIONS_PER_IMAGE", str(TOPK),
    ])
    model = build_model(cfg)

    rng = np.random.RandomState(11)
    raws = [(rng.rand(h, w, 3) * 255).astype(np.uint8) for h, w in SIZES]

    mapper = EvalMapper(cfg)
    fwd = _eval_forward(model)
    root = tmp_path_factory.mktemp("e2e_ap_flagship")
    img_dir = root / "images"
    img_dir.mkdir()
    images_json, annotations = [], []
    aid = 1
    num_classes = cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES
    for i, raw in enumerate(raws):
        fn = f"{i:06d}.png"
        cv2.imwrite(str(img_dir / fn), raw)
        h, w = raw.shape[:2]
        images_json.append({"id": i, "file_name": fn, "height": h,
                            "width": w})
        rec = {"file_name": str(img_dir / fn), "height": h, "width": w,
               "image_id": i}
        sample = mapper(rec)
        lg, mk = fwd(params, jnp.asarray(sample["image"][None]))
        sc, cls, masks = postprocess_instance(
            np.asarray(lg[0]), np.asarray(mk[0]), sample["image_size"],
            h, w, num_classes, TOPK)
        for j in np.argsort(-sc)[:3]:
            polys = _masks_to_polygons(masks[j])
            if not polys:
                continue
            annotations.append({
                "id": aid, "image_id": i,
                "category_id": int(cls[j]) + 1,
                "bbox": [0, 0, 1, 1], "area": float(masks[j].sum()),
                "iscrowd": 0, "segmentation": polys,
            })
            aid += 1
    assert len(annotations) >= len(SIZES), "model produced no usable masks"
    jf = root / "instances.json"
    jf.write_text(json.dumps({
        "images": images_json, "annotations": annotations,
        "categories": [{"id": c + 1, "name": f"c{c}"}
                       for c in range(num_classes)],
    }))
    name = "synthetic_e2e_ap_oracle_flagship_res"
    if name not in DatasetCatalog:
        register_coco_instances(name, str(jf), str(img_dir))
    return tmodel, params, cfg, model, name


@pytest.mark.slow
def test_flagship_res_ap_matches_torch_oracle(pipeline):
    tmodel, params, cfg, model, name = pipeline
    records = DatasetCatalog.get(name)

    # --- JAX AP: per-image path and the fused stream with mixed-size groups
    cfg1 = cfg.clone()
    cfg1.TPU.EVAL_STREAM = 1
    cfg1.DATASETS.TEST = (name,)
    jax_res = run_evaluation(cfg1, model, params, name)
    cfg4 = cfg.clone()
    cfg4.TPU.EVAL_STREAM = 4  # 3-image (1024,1024) group fills (min_fill 2);
    cfg4.DATASETS.TEST = (name,)  # unique-size groups delegate per-image
    jax_res_fused = run_evaluation(cfg4, model, params, name)

    # --- torch pipeline (test_e2e_ap_oracle's, at this cfg's geometry)
    import test_e2e_ap_oracle as base
    old_topk = base.TOPK
    base.TOPK = TOPK
    try:
        torch_dets = _torch_pipeline(tmodel, cfg, name)
    finally:
        base.TOPK = old_topk
    from mp_former_tpu.data.transforms import polygons_to_bitmask

    gts, dts = [], []
    for rec in records:
        h, w = rec["height"], rec["width"]
        for a in rec["annotations"]:
            m = polygons_to_bitmask(
                [np.asarray(p) for p in a["segmentation"]], h, w)
            gts.append({"image_id": rec["image_id"],
                        "category_id": a["category_id"],
                        "mask": m, "area": float(m.sum()), "iscrowd": 0})
        sc, cls, masks = torch_dets[rec["image_id"]]
        for j in range(len(sc)):
            dts.append({"image_id": rec["image_id"],
                        "category_id": int(cls[j]),
                        "mask": masks[j], "score": float(sc[j])})
    oracle = COCOevalOracle(gts, dts, "segm", max_dets=(TOPK,))
    oracle.evaluate()
    oracle.accumulate()
    torch_ap = oracle.summarize()["AP"]

    jax_ap = jax_res["segm"]["AP"]
    jax_ap_fused = jax_res_fused["segm"]["AP"]
    assert torch_ap > 30, f"degenerate oracle AP {torch_ap}"
    assert abs(jax_ap - torch_ap) <= 0.05, (jax_ap, torch_ap)
    assert abs(jax_ap_fused - torch_ap) <= 0.05, (jax_ap_fused, torch_ap)
