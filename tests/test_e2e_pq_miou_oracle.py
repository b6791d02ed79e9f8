"""End-to-end PQ + mIoU oracles: torch pipeline -> oracle scorers vs JAX
run_evaluation (VERDICT round-4 missing #2).

Same GT-from-own-predictions construction as tests/test_e2e_ap_oracle.py,
for the two task families whose host-order fusion logic had no end-to-end
seam test: a torch replica of the ENTIRE reference eval pipeline —
preprocessing canvas -> full-model forward (test_full_model_parity's
replica) -> sem_seg_postprocess (upsample -> crop -> resize,
maskformer_model.py:239-259) -> panoptic_inference (keep filter, prob-mask
argmax, overlap filter, stuff merging, :307-363) / semantic_inference
(einsum, :301-305, in the sem_seg_postprocess_before_inference order forced
by PANOPTIC_ON, :157-161) -> independent oracle scorers (panopticapi-port
PQ, numpy-confusion mIoU) — scored against `run_evaluation` with converted
weights on the same images (±0.1 PQ / ±0.1 mIoU).

The dataset's panoptic/semantic ground truth is generated FROM the JAX
pipeline's own predictions, so both pipelines score near-perfectly and any
drift in the canvas/crop/resize order, the fusion thresholds/merging, or
the evaluators moves PQ/mIoU away from the oracle.
"""

import json

import cv2
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from mp_former_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from mp_former_tpu.data.datasets.register_all import register_coco_panoptic
from mp_former_tpu.engine.checkpoint_import import convert_maskformer_state_dict
from mp_former_tpu.engine.eval_loop import (EvalMapper, _eval_forward,
                                            postprocess_panoptic,
                                            postprocess_semantic,
                                            run_evaluation,
                                            semantic_before_inference)
from mp_former_tpu.models import build_model

from oracle_panoptic import PQStatCatOracle, pq_average, pq_compute_single_image
from test_full_model_parity import TorchMPFormer, _jax_cfg

N_IMAGES = 4
OBJ_T = 0.0    # random-init scores hover near 1/(K+1); keep every query
OVER_T = 0.3   # nonzero so the overlap-filter branch executes


def _id2rgb(ids):
    rgb = np.zeros(ids.shape + (3,), np.uint8)
    rgb[..., 0] = ids % 256
    rgb[..., 1] = (ids // 256) % 256
    rgb[..., 2] = ids // (256 * 256)
    return rgb


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
        "MODEL.MASK_FORMER.TEST.INSTANCE_ON", "False",
        "MODEL.MASK_FORMER.TEST.SEMANTIC_ON", "True",
        "MODEL.MASK_FORMER.TEST.PANOPTIC_ON", "True",
        "MODEL.MASK_FORMER.TEST.OBJECT_MASK_THRESHOLD", str(OBJ_T),
        "MODEL.MASK_FORMER.TEST.OVERLAP_THRESHOLD", str(OVER_T),
        "INPUT.MIN_SIZE_TEST", "96",
        "INPUT.MAX_SIZE_TEST", "128",
    ])
    model = build_model(cfg)
    num_classes = cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES
    # contiguous class c is a thing iff even (exercises stuff merging too)
    is_thing = np.arange(num_classes) % 2 == 0

    rng = np.random.RandomState(7)
    sizes = [(100, 120), (120, 100), (96, 128), (110, 104)]
    raws = [(rng.rand(h, w, 3) * 255).astype(np.uint8) for h, w in sizes]

    root = tmp_path_factory.mktemp("e2e_pq")
    img_dir = root / "coco" / "val2017"
    pan_dir = root / "coco" / "panoptic_val2017"
    sem_dir = root / "coco" / "panoptic_semseg_val2017"
    ann_dir = root / "coco" / "annotations"
    for d in (img_dir, pan_dir, sem_dir, ann_dir):
        d.mkdir(parents=True)

    # ground truth = the JAX pipeline's own panoptic fusion + semantic argmax
    mapper = EvalMapper(cfg)
    fwd = _eval_forward(model)
    images_json, annotations = [], []
    for i, raw in enumerate(raws):
        fn = f"{i:06d}"
        cv2.imwrite(str(img_dir / f"{fn}.jpg"), raw,
                    [cv2.IMWRITE_JPEG_QUALITY, 100])
        h, w = raw.shape[:2]
        rec = {"file_name": str(img_dir / f"{fn}.jpg"), "height": h,
               "width": w, "image_id": i}
        sample = mapper(rec)
        lg, mk = fwd(params, jnp.asarray(sample["image"][None]))
        lg, mk = np.asarray(lg[0]), np.asarray(mk[0])
        pan_map, segments = postprocess_panoptic(
            lg, mk, sample["image_size"], h, w, num_classes, OBJ_T, OVER_T,
            is_thing)
        sem_pred = postprocess_semantic(
            lg, mk, sample["image_size"], h, w,
            before_inference=True).argmax(0).astype(np.uint8)
        cv2.imwrite(str(pan_dir / f"{fn}.png"),
                    cv2.cvtColor(_id2rgb(pan_map.astype(np.int64)),
                                 cv2.COLOR_RGB2BGR))
        cv2.imwrite(str(sem_dir / f"{fn}.png"), sem_pred)
        images_json.append({"id": i, "file_name": f"{fn}.jpg",
                            "height": h, "width": w})
        annotations.append({
            "image_id": i, "file_name": f"{fn}.png",
            "segments_info": [
                {"id": s["id"], "category_id": int(s["category_id"]) + 1,
                 "iscrowd": 0,
                 "area": int((pan_map == s["id"]).sum())}
                for s in segments
            ],
        })
    assert sum(len(a["segments_info"]) for a in annotations) >= N_IMAGES, \
        "model produced no panoptic segments — oracle would be vacuous"
    json.dump({
        "images": images_json, "annotations": annotations,
        "categories": [{"id": c + 1, "name": f"c{c}",
                        "isthing": int(is_thing[c])}
                       for c in range(num_classes)],
    }, open(ann_dir / "panoptic_val2017.json", "w"))

    name = "synthetic_e2e_pq_oracle"
    if name not in DatasetCatalog:
        register_coco_panoptic(
            name,
            str(ann_dir / "panoptic_val2017.json"),
            str(img_dir), str(pan_dir), semseg_root=str(sem_dir),
            ignore_label=255)
    return tmodel, params, cfg, model, name, is_thing


def _torch_pipeline(tmodel, cfg, name, is_thing):
    """Reference-order eval in torch: shared EvalMapper canvas -> torch
    forward -> upsample->crop->resize (sem_seg_postprocess_before_inference,
    forced on by PANOPTIC_ON) -> panoptic fusion (:307-363) + semantic
    einsum (:301-305) at original resolution."""
    assert semantic_before_inference(cfg)
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
            cls_logits = cls_logits[0]

            # --- semantic_inference (reference :301-305) + argmax
            probs = TF.softmax(cls_logits, dim=-1)[:, :-1]
            semseg = torch.einsum("qc,qhw->chw", probs, m.sigmoid())
            sem_pred = semseg.argmax(0).numpy()

            # --- panoptic_inference (reference :307-363)
            scores, labels = TF.softmax(cls_logits, dim=-1).max(-1)
            sig = m.sigmoid()
            keep = labels.ne(num_classes) & (scores > OBJ_T)
            cur_scores = scores[keep]
            cur_classes = labels[keep]
            cur_masks = sig[keep]
            cur_prob_masks = cur_scores.view(-1, 1, 1) * cur_masks
            h, w = cur_masks.shape[-2:]
            pan = torch.zeros((h, w), dtype=torch.int32)
            segments = []
            current_segment_id = 0
            if cur_masks.shape[0] > 0:
                cur_mask_ids = cur_prob_masks.argmax(0)
                stuff_memory = {}
                for k in range(cur_classes.shape[0]):
                    pred_class = int(cur_classes[k])
                    isthing = bool(is_thing[pred_class])
                    mask_area = (cur_mask_ids == k).sum().item()
                    original_area = (cur_masks[k] >= 0.5).sum().item()
                    mask = (cur_mask_ids == k) & (cur_masks[k] >= 0.5)
                    if mask_area > 0 and original_area > 0 \
                            and mask.sum().item() > 0:
                        if mask_area / original_area < OVER_T:
                            continue
                        if not isthing:
                            if pred_class in stuff_memory:
                                pan[mask] = stuff_memory[pred_class]
                                continue
                            stuff_memory[pred_class] = current_segment_id + 1
                        current_segment_id += 1
                        pan[mask] = current_segment_id
                        segments.append({"id": current_segment_id,
                                         "isthing": isthing,
                                         "category_id": pred_class})
        per_image[rec["image_id"]] = (pan.numpy(), segments, sem_pred)
    return per_image


@pytest.mark.slow
def test_torch_pipeline_pq_miou_match_jax(pipeline):
    tmodel, params, cfg, model, name, is_thing = pipeline
    records = DatasetCatalog.get(name)
    num_classes = cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES

    # --- JAX pipeline PQ + mIoU through run_evaluation (one forward feeds
    # the panoptic and semantic evaluators)
    cfg1 = cfg.clone()
    cfg1.DATASETS.TEST = (name,)
    jax_res = run_evaluation(cfg1, model, params, name)
    jax_pq = jax_res["panoptic_seg"]["All"]["PQ"]
    jax_miou = jax_res["sem_seg"]["mIoU"]

    # --- torch pipeline -> independent oracles
    torch_out = _torch_pipeline(tmodel, cfg, name, is_thing)
    from mp_former_tpu.data.dataset_mappers.mask_former_mappers import rgb2id

    stat = PQStatCatOracle()
    conf = np.zeros((num_classes, num_classes), np.int64)
    for rec in records:
        pan_pred, segments, sem_pred = torch_out[rec["image_id"]]
        gt_png = cv2.cvtColor(cv2.imread(rec["pan_seg_file_name"]),
                              cv2.COLOR_BGR2RGB)
        gt_map = rgb2id(gt_png).astype(np.int64)
        # record segments carry CONTIGUOUS ids (registration remaps);
        # oracle needs matching conventions on both sides
        pq_compute_single_image(
            stat, gt_map, pan_pred,
            [dict(s) for s in rec["segments_info"]],
            [{"id": s["id"], "category_id": s["category_id"]}
             for s in segments])
        sem_gt = cv2.imread(rec["sem_seg_file_name"],
                            cv2.IMREAD_UNCHANGED)
        if sem_gt.ndim == 3:
            sem_gt = sem_gt[..., 0]
        valid = sem_gt != 255
        conf += np.bincount(
            num_classes * sem_pred[valid].astype(np.int64)
            + sem_gt[valid].astype(np.int64),
            minlength=num_classes * num_classes,
        ).reshape(num_classes, num_classes)

    cats = set(stat.tp) | set(stat.fp) | set(stat.fn)
    torch_pq = pq_average(stat, cats)["PQ"]
    tp = conf.diagonal().astype(np.float64)
    pos_gt = conf.sum(0).astype(np.float64)
    pos_pred = conf.sum(1).astype(np.float64)
    union = pos_gt + pos_pred - tp
    valid = (pos_gt > 0) & (union > 0)
    torch_miou = 100 * float((tp[valid] / union[valid]).mean())

    # GT came from the JAX pipeline's own predictions -> both near-perfect;
    # any order/threshold/fusion drift moves one side away from the other
    assert torch_pq > 60, f"degenerate oracle PQ {torch_pq}"
    assert torch_miou > 60, f"degenerate oracle mIoU {torch_miou}"
    assert abs(jax_pq - torch_pq) <= 0.1, (jax_pq, torch_pq)
    assert abs(jax_miou - torch_miou) <= 0.1, (jax_miou, torch_miou)
