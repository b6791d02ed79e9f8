"""End-to-end AP oracle: torch pipeline -> COCOeval vs JAX run_evaluation.

The strongest runnable proxy for the north-star check (released checkpoint
-> COCO val AP 40.15 +/- 0.2, reference README.md:25 / eval.sh:15-16),
which cannot run here (no released .pth, no COCO val): a torch replica of
the ENTIRE reference eval pipeline — preprocessing canvas -> full-model
forward (test_full_model_parity's replica) -> sem_seg_postprocess
(upsample -> crop -> resize-to-original, maskformer_model.py:239-259) ->
instance_inference (topk over Q*K, mask rescoring, binarize, :365-401) ->
COCOeval (the pycocotools-structured oracle) — scored against
`run_evaluation` on the same images with converted weights, both the
per-image and the fused-stream eval paths.

To make the AP sensitive (a random model scores 0 vs arbitrary GT), the
dataset's ground truth is generated FROM the model's own top predictions
(mask contours -> polygons): the pipelines then score high AP, and any
drift in the canvas/crop/resize order, topk tie handling, rescoring, or the
evaluator moves IoU at high thresholds and with it the AP.
"""

import json

import cv2
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from mp_former_tpu.data.catalog import DatasetCatalog
from mp_former_tpu.data.datasets.coco import register_coco_instances
from mp_former_tpu.engine.checkpoint_import import convert_maskformer_state_dict
from mp_former_tpu.engine.eval_loop import (EvalMapper, _eval_forward,
                                            postprocess_instance,
                                            run_evaluation)
from mp_former_tpu.models import build_model

from oracle_cocoeval import COCOevalOracle
from test_full_model_parity import TorchMPFormer, _jax_cfg

TOPK = 10
N_IMAGES = 6


def _masks_to_polygons(mask):
    """Binary mask -> COCO polygon list via contours (GT construction)."""
    contours, _ = cv2.findContours(mask.astype(np.uint8), cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_NONE)
    polys = []
    for c in contours:
        c = c.reshape(-1, 2)
        if len(c) >= 3 and cv2.contourArea(c) > 40:
            polys.append(c.reshape(-1).astype(float).tolist())
    return polys


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
        "INPUT.MIN_SIZE_TEST", "96",
        "INPUT.MAX_SIZE_TEST", "128",
        "TEST.DETECTIONS_PER_IMAGE", str(TOPK),
    ])
    model = build_model(cfg)

    # raw images of DIFFERENT original sizes
    rng = np.random.RandomState(5)
    sizes = [(100, 120), (120, 100), (96, 128), (128, 128), (110, 104),
             (100, 120)]
    raws = [(rng.rand(h, w, 3) * 255).astype(np.uint8) for h, w in sizes]

    # ground truth = the JAX pipeline's own confident predictions
    mapper = EvalMapper(cfg)
    fwd = _eval_forward(model)
    root = tmp_path_factory.mktemp("e2e_ap")
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
    assert len(annotations) >= N_IMAGES, "model produced no usable masks"
    jf = root / "instances.json"
    jf.write_text(json.dumps({
        "images": images_json, "annotations": annotations,
        "categories": [{"id": c + 1, "name": f"c{c}"}
                       for c in range(num_classes)],
    }))
    name = "synthetic_e2e_ap_oracle"
    register_coco_instances(name, str(jf), str(img_dir))
    return tmodel, params, cfg, model, name, raws


def _torch_pipeline(tmodel, cfg, name):
    """Reference-order eval in torch: shared EvalMapper canvas -> torch
    forward -> upsample->crop->resize (F.interpolate bilinear,
    align_corners=False) -> topk/rescore/binarize -> dict dets."""
    mapper = EvalMapper(cfg)
    records = DatasetCatalog.get(name)
    num_classes = cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES
    per_image = {}
    for rec in records:
        sample = mapper(rec)
        canvas = torch.from_numpy(
            np.ascontiguousarray(sample["image"].transpose(2, 0, 1)))[None]
        with torch.no_grad():
            cls_logits, mask_logits = tmodel(canvas.float())
            ch, cw = canvas.shape[-2:]
            m = TF.interpolate(mask_logits, size=(ch, cw), mode="bilinear",
                               align_corners=False)[0]
            ih, iw = sample["image_size"]
            m = m[:, :ih, :iw]
            m = TF.interpolate(m[None], size=(rec["height"], rec["width"]),
                               mode="bilinear", align_corners=False)[0]
            scores = TF.softmax(cls_logits[0], dim=-1)[:, :-1]
            flat = scores.flatten()
            topk_scores, topk_idx = flat.topk(TOPK)
            labels = topk_idx % num_classes
            qidx = torch.div(topk_idx, num_classes, rounding_mode="floor")
            masks = m[qidx]
            binary = masks > 0
            sig = torch.sigmoid(masks)
            binf = binary.float()
            mask_scores = (sig * binf).sum((1, 2)) / (binf.sum((1, 2)) + 1e-6)
            final = topk_scores * mask_scores
        per_image[rec["image_id"]] = (
            final.numpy(), labels.numpy(), binary.numpy())
    return per_image


@pytest.mark.slow
def test_torch_pipeline_ap_matches_jax(pipeline):
    tmodel, params, cfg, model, name, raws = pipeline
    records = DatasetCatalog.get(name)
    num_classes = cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES

    # --- JAX pipeline AP: per-image path and fused stream
    cfg1 = cfg.clone()
    cfg1.TPU.EVAL_STREAM = 1
    cfg1.DATASETS.TEST = (name,)
    jax_res = run_evaluation(cfg1, model, params, name)
    cfg8 = cfg.clone()
    cfg8.TPU.EVAL_STREAM = 8
    cfg8.DATASETS.TEST = (name,)
    jax_res_fused = run_evaluation(cfg8, model, params, name)

    # --- torch pipeline -> oracle COCOeval
    torch_dets = _torch_pipeline(tmodel, cfg, name)
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
            # records carry CONTIGUOUS ids (registration remaps the json's
            # 1-based ids); model classes are contiguous already
            dts.append({"image_id": rec["image_id"],
                        "category_id": int(cls[j]),
                        "mask": masks[j], "score": float(sc[j])})
    oracle = COCOevalOracle(gts, dts, "segm", max_dets=(TOPK,))
    oracle.evaluate()
    oracle.accumulate()
    torch_ap = oracle.summarize()["AP"]

    jax_ap = jax_res["segm"]["AP"]
    jax_ap_fused = jax_res_fused["segm"]["AP"]
    # GT is the model's own masks -> high AP; parity must hold to 0.05
    assert torch_ap > 30, f"degenerate oracle AP {torch_ap}"
    assert abs(jax_ap - torch_ap) <= 0.05, (jax_ap, torch_ap)
    assert abs(jax_ap_fused - torch_ap) <= 0.05, (jax_ap_fused, torch_ap)


@pytest.mark.slow
def test_torch_pipeline_outputs_match_jax_per_image(pipeline):
    """Per-image seam check: scores/classes/masks from the torch pipeline
    vs the JAX per-image eval path on every image (mask IoU >= 0.99)."""
    tmodel, params, cfg, model, name, raws = pipeline
    records = DatasetCatalog.get(name)
    num_classes = cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES
    mapper = EvalMapper(cfg)
    fwd = _eval_forward(model)
    torch_dets = _torch_pipeline(tmodel, cfg, name)
    for rec in records:
        sample = mapper(rec)
        lg, mk = fwd(params, jnp.asarray(sample["image"][None]))
        sc, cls, masks = postprocess_instance(
            np.asarray(lg[0]), np.asarray(mk[0]), sample["image_size"],
            rec["height"], rec["width"], num_classes, TOPK)
        tsc, tcls, tmasks = torch_dets[rec["image_id"]]
        np.testing.assert_allclose(sc, tsc, rtol=2e-3, atol=2e-4,
                                   err_msg=str(rec["image_id"]))
        np.testing.assert_array_equal(cls, tcls)
        for j in range(TOPK):
            inter = np.logical_and(masks[j], tmasks[j]).sum()
            union = np.logical_or(masks[j], tmasks[j]).sum()
            if union == 0:
                continue
            assert inter / union >= 0.99, (rec["image_id"], j, inter / union)
