"""End-to-end video tube-AP oracle: torch pipeline -> tube COCOeval vs
`inference_on_video_dataset` (completes the e2e-oracle family: instance AP,
panoptic PQ, semantic mIoU, video tube AP).

The video analog of tests/test_e2e_ap_oracle.py, the strongest runnable
proxy for the released-checkpoint YTVIS check (reference
mask2former_video/README + eval via train_net_video.py): a torch replica of
the ENTIRE reference video eval pipeline — whole-clip preprocessing (shared
`prep_clip` canvas) -> VideoMaskFormer forward (per-frame backbone + pixel
decoder, temporal decoder with 3D sine PE and the KEPT query_embed,
reference video_mask2former_transformer_decoder.py:280,323) ->
inference_video postprocess (topk over Q*K, x4 upsample -> crop -> resize,
video_maskformer_model.py:255-287) -> tube AP over time-flattened masks
(the independent COCOevalOracle) — scored against the JAX
`inference_on_video_dataset` with converted weights.

GT is generated FROM the model's own top tube predictions (per-frame mask
contours -> polygons), so both pipelines score high AP and any drift in the
canvas, temporal PE, attention-mask routing, tube resize order, or the
evaluator moves IoU at high thresholds and with it the AP.
"""

import math

import cv2
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from mp_former_tpu.config import (add_deeplab_config, add_maskformer2_config,
                                  add_maskformer2_video_config, get_cfg)
from mp_former_tpu.engine.checkpoint_import import convert_maskformer_state_dict
from mp_former_tpu.models import build_model
from mp_former_tpu.video.eval_loop import (inference_on_video_dataset,
                                           inference_video, make_clip_forward,
                                           prep_clip)
from mp_former_tpu.video.ytvis import _seg_to_mask

from oracle_cocoeval import COCOevalOracle
from test_e2e_ap_oracle import _masks_to_polygons
from test_full_model_parity import (TorchD2ResNet50, TorchPixelDecoder, t_pe)

C = 256
HEADS = 8
Q = 100
K = 40            # YTVIS-2019 class count (flagship video config)
DEC_LAYERS = 9    # DEC_LAYERS cfg 10 -> 9 iterations
MASK_DIM = 256
TOPK = 10


# --------------------------------------------------------------------------
# torch video decoder (reference video_mask2former_transformer_decoder.py:
# 3D sine PE :280, query_embed KEPT :323, mask head bqc,btchw->bqthw)
class TorchVideoDecoder(tnn.Module):
    def __init__(self):
        super().__init__()
        self.transformer_self_attention_layers = tnn.ModuleList()
        self.transformer_cross_attention_layers = tnn.ModuleList()
        self.transformer_ffn_layers = tnn.ModuleList()
        for _ in range(DEC_LAYERS):
            sa = tnn.Module()
            sa.self_attn = tnn.MultiheadAttention(C, HEADS)
            sa.norm = tnn.LayerNorm(C)
            self.transformer_self_attention_layers.append(sa)
            ca = tnn.Module()
            ca.multihead_attn = tnn.MultiheadAttention(C, HEADS)
            ca.norm = tnn.LayerNorm(C)
            self.transformer_cross_attention_layers.append(ca)
            ff = tnn.Module()
            ff.linear1 = tnn.Linear(C, 2048)
            ff.linear2 = tnn.Linear(2048, C)
            ff.norm = tnn.LayerNorm(C)
            self.transformer_ffn_layers.append(ff)
        self.decoder_norm = tnn.LayerNorm(C)
        self.query_feat = tnn.Embedding(Q, C)
        self.query_embed = tnn.Embedding(Q, C)  # kept in the video decoder
        self.level_embed = tnn.Embedding(3, C)
        self.class_embed = tnn.Linear(C, K + 1)
        self.mask_embed = tnn.Module()
        self.mask_embed.layers = tnn.ModuleList(
            [tnn.Linear(C, C), tnn.Linear(C, C), tnn.Linear(C, MASK_DIM)])

    @staticmethod
    def _temporal_pos(t):
        """(T, C) temporal sine term of PositionEmbeddingSine3D (unpadded
        clip: not_mask all ones)."""
        z = torch.arange(1, t + 1, dtype=torch.float32)
        z = z / (t + 1e-6) * (2 * math.pi)
        dim_tz = torch.arange(C, dtype=torch.float32)
        dim_tz = 10000 ** (2 * (dim_tz // 2) / C)
        pz = z[:, None] / dim_tz
        return torch.stack((pz[:, 0::2].sin(), pz[:, 1::2].cos()),
                           dim=2).flatten(1)

    def heads(self, output, mask_features, size):
        """output (Q, 1, C); mask_features (T, C, hm, wm)."""
        t = mask_features.shape[0]
        dec = self.decoder_norm(output).transpose(0, 1)  # (1, Q, C)
        cls = self.class_embed(dec)
        memb = dec
        for i, l in enumerate(self.mask_embed.layers):
            memb = l(memb)
            if i < 2:
                memb = TF.relu(memb)
        om = torch.einsum("bqc,tchw->bqthw", memb, mask_features)
        am = TF.interpolate(om[0], size=size, mode="bilinear",
                            align_corners=False)  # (Q, T, sh, sw)
        am = (am.sigmoid().reshape(1, 1, Q, -1)
              .repeat(1, HEADS, 1, 1).flatten(0, 1) < 0.5).bool()
        return cls, om, am.detach()

    def forward(self, x, mask_features):
        t = mask_features.shape[0]
        pos_z = self._temporal_pos(t)  # (T, C)
        src, pos, sizes = [], [], []
        for i, xi in enumerate(x):
            h, w = xi.shape[-2:]
            sizes.append((h, w))
            pe = t_pe(h, w, C // 2).flatten(1).permute(1, 0)  # (hw, C)
            p = pe[None, :, :] + pos_z[:, None, :]            # (T, hw, C)
            pos.append(p.reshape(t * h * w, 1, C))
            s = xi.flatten(2).permute(0, 2, 1).reshape(t * h * w, 1, C)
            src.append(s + self.level_embed.weight[i][None, None, :])
        qpos = self.query_embed.weight.unsqueeze(1)   # (Q, 1, C)
        output = self.query_feat.weight.unsqueeze(1)  # (Q, 1, C)
        cls, om, am = self.heads(output, mask_features, sizes[0])
        for i in range(DEC_LAYERS):
            lvl = i % 3
            am[torch.where(am.sum(-1) == am.shape[-1])] = False
            ca = self.transformer_cross_attention_layers[i]
            out2 = ca.multihead_attn(
                query=output + qpos, key=src[lvl] + pos[lvl], value=src[lvl],
                attn_mask=am)[0]
            output = ca.norm(output + out2)
            sa = self.transformer_self_attention_layers[i]
            out2 = sa.self_attn(output + qpos, output + qpos, value=output)[0]
            output = sa.norm(output + out2)
            ff = self.transformer_ffn_layers[i]
            output = ff.norm(output + ff.linear2(TF.relu(ff.linear1(output))))
            cls, om, am = self.heads(output, mask_features,
                                     sizes[(i + 1) % 3])
        return cls, om


class TorchVideoMPFormer(tnn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TorchD2ResNet50()
        head = tnn.Module()
        head.pixel_decoder = TorchPixelDecoder()
        head.predictor = TorchVideoDecoder()
        self.sem_seg_head = head

    def forward(self, clip):
        """clip (T, 3, H, W) raw RGB -> ((1, Q, K+1), (1, Q, T, h4, w4))."""
        mean = torch.tensor([123.675, 116.280, 103.530])[None, :, None, None]
        std = torch.tensor([58.395, 57.120, 57.375])[None, :, None, None]
        feats = self.backbone((clip - mean) / std)
        mask_features, maps = self.sem_seg_head.pixel_decoder(feats)
        return self.sem_seg_head.predictor(maps, mask_features)


def _video_cfg():
    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    add_maskformer2_video_config(cfg)
    cfg.merge_from_file(
        "configs/youtubevis_2019/video_maskformer2_R50_bs16_8ep.yaml")
    cfg.merge_from_list([
        "MODEL.MASK_FORMER.DROPOUT", "0.0",
        "INPUT.MIN_SIZE_TEST", "96",
        "INPUT.MAX_SIZE_TEST", "128",
    ])
    return cfg


def _torch_inference_video(cls_logits, om, img_size, out_h, out_w):
    """inference_video replica in torch: softmax topk over Q*K, x4 upsample
    -> crop -> resize-to-original -> >0 (video_maskformer_model.py:255-287).
    Same float64 softmax + argsort ordering as the JAX pipeline so ties
    cannot reorder detections between the two."""
    scores = torch.softmax(cls_logits[0].double(), -1)[:, :-1].numpy()
    flat = scores.reshape(-1)
    top = np.argsort(-flat)[:TOPK]
    tube_scores = flat[top]
    tube_classes = (top % K).astype(np.int64)
    tube_q = top // K

    sel = om[0][torch.from_numpy(tube_q)]  # (topk, T, h4, w4)
    ch, cw = sel.shape[2] * 4, sel.shape[3] * 4
    m = TF.interpolate(sel, size=(ch, cw), mode="bilinear",
                       align_corners=False)
    m = m[:, :, : img_size[0], : img_size[1]]
    m = TF.interpolate(m, size=(out_h, out_w), mode="bilinear",
                       align_corners=False)
    return tube_scores, tube_classes, (m > 0).numpy()


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    torch.manual_seed(0)
    tmodel = TorchVideoMPFormer().eval()
    for layer in tmodel.sem_seg_head.pixel_decoder.transformer.encoder.layers:
        lin = layer.self_attn.sampling_offsets
        tnn.init.uniform_(lin.weight, -0.01, 0.01)
        tnn.init.uniform_(lin.bias, -2.0, 2.0)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = {"params": convert_maskformer_state_dict(sd)}

    cfg = _video_cfg()
    model = build_model(cfg)

    # raw clips of DIFFERENT original sizes and lengths (T <= 4: exact
    # t-buckets; the padded-bucket path is pinned separately by
    # test_video.py::test_padded_clip_matches_unpadded)
    rng = np.random.RandomState(7)
    shapes = [(2, 100, 120), (3, 120, 100), (4, 96, 128)]
    root = tmp_path_factory.mktemp("e2e_tubeap")
    records = []
    for vid, (t, h, w) in enumerate(shapes, start=1):
        vdir = root / f"v{vid}"
        vdir.mkdir()
        file_names = []
        for fi in range(t):
            img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            p = str(vdir / f"{fi:05d}.png")
            cv2.imwrite(p, img)
            file_names.append(p)
        records.append({"video_id": vid, "height": h, "width": w,
                        "length": t, "file_names": file_names,
                        "annotations": []})

    # ground truth = the JAX pipeline's own top-3 tubes per video
    for rec in records:
        it = prep_clip(cfg, rec)
        fwd = make_clip_forward(cfg, it["t_pad"])
        logits, masks = fwd(params, jnp.asarray(it["clip"][None]),
                            jnp.asarray(it["fv"][None]))
        scores, classes, tubes = inference_video(
            np.asarray(logits[0]), masks[0, :, : it["t"]],
            (it["rh"], it["rw"]), rec["height"], rec["width"], K)
        aid = 1
        for j in np.argsort(-scores)[:3]:
            segs, areas = [], []
            nonempty = 0
            for fi in range(it["t"]):
                polys = _masks_to_polygons(tubes[j][fi])
                if polys:
                    segs.append(polys)
                    areas.append(float(tubes[j][fi].sum()))
                    nonempty += 1
                else:
                    segs.append(None)
                    areas.append(None)
            if nonempty == 0:
                continue
            rec["annotations"].append({
                "id": aid, "category_id": int(classes[j]), "iscrowd": 0,
                "segmentations": segs, "areas": areas})
            aid += 1
    assert sum(len(r["annotations"]) for r in records) >= len(records), \
        "model produced no usable tubes"
    return tmodel, params, cfg, model, records


def _torch_pipeline(tmodel, cfg, records):
    """Shared prep_clip canvas -> torch whole-clip forward (unpadded T) ->
    torch inference_video -> per-video tubes."""
    per_video = {}
    for rec in records:
        it = prep_clip(cfg, rec)
        clip = torch.from_numpy(
            np.ascontiguousarray(
                it["clip"][: it["t"]].transpose(0, 3, 1, 2)))
        with torch.no_grad():
            cls_logits, om = tmodel(clip.float())
            sc, cl, tubes = _torch_inference_video(
                cls_logits, om, (it["rh"], it["rw"]),
                rec["height"], rec["width"])
        per_video[rec["video_id"]] = (sc, cl, tubes)
    return per_video


def _gt_tube(a, t, h, w):
    tube = np.zeros((t, h, w), bool)
    segs = a.get("segmentations") or []
    for fi in range(min(t, len(segs))):
        m = _seg_to_mask(segs[fi], h, w)
        if m is not None:
            tube[fi] = m
    return tube


@pytest.mark.slow
def test_torch_pipeline_tube_ap_matches_jax(pipeline):
    tmodel, params, cfg, model, records = pipeline

    jax_res = inference_on_video_dataset(cfg, model, params, records)
    jax_ap = jax_res["segm"]["AP"]

    torch_dets = _torch_pipeline(tmodel, cfg, records)
    gts, dts = [], []
    for rec in records:
        t, h, w = rec["length"], rec["height"], rec["width"]
        for a in rec["annotations"]:
            tube = _gt_tube(a, t, h, w)
            areas = [x for x in (a.get("areas") or []) if x]
            gts.append({
                "image_id": rec["video_id"], "category_id": a["category_id"],
                "mask": tube.reshape(t * h, w),
                # mean per-frame area, the YTVIS convention
                "area": float(np.mean(areas)) if areas else float(tube.sum()),
                "iscrowd": 0})
        sc, cl, tubes = torch_dets[rec["video_id"]]
        for j in range(len(sc)):
            dts.append({
                "image_id": rec["video_id"], "category_id": int(cl[j]),
                "mask": tubes[j].reshape(t * h, w), "score": float(sc[j])})
    oracle = COCOevalOracle(gts, dts, "segm", max_dets=(100,))
    oracle.evaluate()
    oracle.accumulate()
    torch_ap = oracle.summarize()["AP"]

    assert abs(jax_ap - torch_ap) <= 0.05, (jax_ap, torch_ap)
    # random-init tube masks are fragmented and the per-frame polygon
    # rasterization loss compounds over T in the tube IoU, so the
    # self-matching AP sits lower than the image oracle's; the guard only
    # rejects a fully-degenerate (AP ~ 0) setup
    assert torch_ap > 15, f"degenerate oracle tube AP {torch_ap}"


@pytest.mark.slow
def test_torch_pipeline_tubes_match_jax_per_video(pipeline):
    """Per-video seam check: scores/classes/tube masks from the torch
    pipeline vs the JAX whole-clip path (tube IoU >= 0.99)."""
    tmodel, params, cfg, model, records = pipeline
    torch_dets = _torch_pipeline(tmodel, cfg, records)
    for rec in records:
        it = prep_clip(cfg, rec)
        fwd = make_clip_forward(cfg, it["t_pad"])
        logits, masks = fwd(params, jnp.asarray(it["clip"][None]),
                            jnp.asarray(it["fv"][None]))
        sc, cl, tubes = inference_video(
            np.asarray(logits[0]), masks[0, :, : it["t"]],
            (it["rh"], it["rw"]), rec["height"], rec["width"], K)
        tsc, tcl, ttubes = torch_dets[rec["video_id"]]
        np.testing.assert_allclose(sc, tsc, rtol=2e-3, atol=2e-4,
                                   err_msg=str(rec["video_id"]))
        np.testing.assert_array_equal(cl, tcl)
        for j in range(TOPK):
            inter = np.logical_and(tubes[j], ttubes[j]).sum()
            union = np.logical_or(tubes[j], ttubes[j]).sum()
            if union == 0:
                continue
            assert inter / union >= 0.99, (rec["video_id"], j, inter / union)
