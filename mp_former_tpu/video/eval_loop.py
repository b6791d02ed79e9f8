"""Per-clip video inference loop (reference train_net_video.py eval path +
video_maskformer_model.py inference_video :255-287 + YTVISEvaluator)."""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.interp import resize
from .ytvis_eval import YTVISEvaluator

logger = logging.getLogger(__name__)


def inference_video(logits: np.ndarray, masks, img_size, out_h, out_w,
                    num_classes: int, topk: int = 10):
    """(Q, K+1) + (Q, T, h4, w4) -> top-k tubes at original resolution."""
    import scipy.special

    scores = scipy.special.softmax(logits.astype(np.float64), -1)[:, :-1]
    flat = scores.reshape(-1)
    top = np.argsort(-flat)[:topk]
    tube_scores = flat[top]
    tube_classes = (top % num_classes).astype(np.int64)
    tube_q = top // num_classes

    sel = jnp.asarray(np.asarray(masks)[tube_q])  # (topk, T, h4, w4)
    canvas_h, canvas_w = sel.shape[2] * 4, sel.shape[3] * 4
    m = resize(sel, (canvas_h, canvas_w), "bilinear")
    m = m[:, :, : img_size[0], : img_size[1]]
    m = resize(m, (out_h, out_w), "bilinear")
    return tube_scores, tube_classes, np.asarray(m > 0)


def t_bucket(t: int) -> int:
    """Static clip-length bucket: exact up to 4, then multiples of 4.
    Each bucket is one jit compilation; YTVIS clips reach ~36 frames."""
    if t <= 4:
        return max(t, 1)
    return ((t + 3) // 4) * 4


def make_clip_forward(cfg, t_pad: int):
    """Jitted whole-clip forward at a static T bucket. The model is rebuilt
    with SAMPLING_FRAME_NUM=t_pad (decoder layout depends on T; parameters
    do not), and padding frames are excluded from every cross-attention via
    frame_valid, so real-frame outputs equal the unpadded forward
    (tests/test_video.py::test_padded_clip_matches_unpadded)."""
    from ..models import build_model

    c = cfg.clone()
    c.defrost()
    c.INPUT.SAMPLING_FRAME_NUM = t_pad
    c.freeze()
    m = build_model(c)

    @jax.jit
    def fwd(p, im, fv):
        out = m.apply(p, im, None, train=False, frame_valid=fv)
        return out["pred_logits"], out["pred_masks"]

    return fwd


# jitted per-T-bucket clip forwards keyed by model identity, so periodic
# eval during training does not re-trace every call
from collections import OrderedDict

from ..utils.memory import pinned_lru_get

_CLIP_FWD_CACHE: "OrderedDict[tuple, tuple]" = OrderedDict()
_CLIP_FWD_CACHE_MAX = 16


def _clip_forward(cfg, model, t_pad: int):
    return pinned_lru_get(
        _CLIP_FWD_CACHE, (id(model), t_pad), model,
        lambda: make_clip_forward(cfg, t_pad), _CLIP_FWD_CACHE_MAX)


def prep_clip(cfg, rec, max_frames: Optional[int] = None):
    """Decode + shortest-edge-resize + mean-pad one clip record -> dict or
    None (reference/d2 ResizeShortestEdge semantics; shared by the eval loop
    and the e2e oracle tests so preprocessing is common to both pipelines)."""
    pixel_mean = np.asarray(cfg.MODEL.PIXEL_MEAN, np.float32)
    t = (rec["length"] if max_frames is None
         else min(rec["length"], max_frames))
    h, w = rec["height"], rec["width"]
    scale = cfg.INPUT.MIN_SIZE_TEST / min(h, w)
    if max(h, w) * scale > cfg.INPUT.MAX_SIZE_TEST:
        scale = cfg.INPUT.MAX_SIZE_TEST / max(h, w)
    rh, rw = int(h * scale + 0.5), int(w * scale + 0.5)
    nh = (rh + 31) // 32 * 32
    nw = (rw + 31) // 32 * 32
    frames = []
    for fi in range(t):
        img = cv2.imread(rec["file_names"][fi], cv2.IMREAD_COLOR)
        if img is None:
            break
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        canvas = np.broadcast_to(
            pixel_mean, (nh, nw, 3)).astype(np.float32).copy()
        canvas[:rh, :rw] = cv2.resize(img, (rw, rh))
        frames.append(canvas)
    if len(frames) < t:
        return None
    t_pad = t_bucket(t)
    frames += [frames[-1]] * (t_pad - t)
    return {"rec": rec, "t": t, "t_pad": t_pad, "rh": rh, "rw": rw,
            "clip": np.stack(frames).astype(np.float32),
            "fv": np.arange(t_pad) < t}


def inference_on_video_dataset(cfg, model, params, records: List[dict],
                               max_videos: Optional[int] = None,
                               max_frames: Optional[int] = None,
                               mesh=None) -> Dict:
    """Evaluate video AP over a YTVIS-style dataset on WHOLE clips
    (reference video_maskformer_model.py:255-287 feeds the entire clip in
    one forward). Clip lengths are padded to static T buckets by repeating
    the last frame; padding frames are masked out of cross-attention and
    their predictions discarded. `max_frames` optionally caps very long
    clips (None = no cap).

    Distributed eval mirrors the image loop (engine/eval_loop.py): pass
    `mesh` to batch same-shape clips across its devices in one sharded
    forward; under multi-process JAX each process evaluates a disjoint
    video shard and evaluator states are merged before evaluate()."""
    import jax

    evaluator = YTVISEvaluator(records)
    num_classes = cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES

    from ..parallel.dist import resolve_eval_mesh, sharded_eval_loop

    mesh = resolve_eval_mesh(mesh)
    n_dev = int(mesh.devices.size) if mesh is not None else 1
    if n_dev > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        data_s = NamedSharding(mesh, P("data"))
        params_put = jax.device_put(params, NamedSharding(mesh, P()))
    else:
        params_put = params

    def prep(rec):
        return prep_clip(cfg, rec, max_frames)

    n = 0

    def flush(items):
        nonlocal n
        t_pad = items[0]["t_pad"]
        fwd = _clip_forward(cfg, model, t_pad)
        k = len(items)
        pad = (n_dev - k) if n_dev > 1 else 0
        clips = np.stack([it["clip"] for it in items]
                         + [items[-1]["clip"]] * pad)
        fvs = np.stack([it["fv"] for it in items] + [items[-1]["fv"]] * pad)
        if n_dev > 1:
            clips = jax.device_put(clips, data_s)
            fvs = jax.device_put(fvs, data_s)
        else:
            clips, fvs = jnp.asarray(clips), jnp.asarray(fvs)
        logits, masks = fwd(params_put, clips, fvs)
        logits = np.asarray(logits)
        for i, it in enumerate(items):
            scores, classes, tubes = inference_video(
                logits[i], masks[i, :, : it["t"]],
                (it["rh"], it["rw"]), it["rec"]["height"],
                it["rec"]["width"], num_classes)
            evaluator.process(it["rec"]["video_id"], scores, classes,
                              [tubes[j] for j in range(tubes.shape[0])])
            n += 1

    sharded_eval_loop(
        records, evaluator, prep,
        key_fn=lambda it: (it["t_pad"],) + it["clip"].shape,
        flush_fn=flush, n_dev=n_dev, max_records=max_videos)

    results = evaluator.evaluate()
    logger.info("evaluated %d videos: %s", n, results)
    return results
