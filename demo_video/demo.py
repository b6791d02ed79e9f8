#!/usr/bin/env python
"""Video demo (reference demo_video/demo.py + predictor.py + visualizer.py):
run video instance segmentation over a clip (directory of frames or a video
file) and write per-frame track visualizations with consistent per-instance
colors (TrackVisualizer role).

Usage:
  python demo_video/demo.py --config-file configs/youtubevis_2019/video_maskformer2_R50_bs16_8ep.yaml \
      --input frames_dir/ --output out_dir [opts ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2
import numpy as np


def read_frames(path, max_frames=None):
    if os.path.isdir(path):
        files = sorted(
            f for f in os.listdir(path) if f.lower().endswith((".jpg", ".png")))
        for f in files[:max_frames]:
            yield cv2.imread(os.path.join(path, f))
    else:
        cap = cv2.VideoCapture(path)
        n = 0
        while cap.isOpened():
            ok, frame = cap.read()
            if not ok or (max_frames and n >= max_frames):
                break
            yield frame
            n += 1
        cap.release()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--input", required=True)
    p.add_argument("--output", default="demo_video_out")
    p.add_argument("--confidence-threshold", type=float, default=0.5)
    p.add_argument("--max-frames", type=int, default=8)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    import mp_former_tpu.video  # noqa: F401
    from mp_former_tpu.config import (add_deeplab_config, add_maskformer2_config,
                                      add_maskformer2_video_config, get_cfg)
    from mp_former_tpu.models import build_model
    from mp_former_tpu.utils.interp import resize

    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    add_maskformer2_video_config(cfg)
    cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(
        (args.opts or []) + ["INPUT.SAMPLING_FRAME_NUM", str(args.max_frames)])
    model = build_model(cfg)
    os.makedirs(args.output, exist_ok=True)

    frames = list(read_frames(args.input, args.max_frames))
    assert frames, f"no frames found in {args.input}"
    h, w = frames[0].shape[:2]
    scale = cfg.INPUT.MIN_SIZE_TEST / min(h, w)
    nh = (int(h * scale + 0.5) + 31) // 32 * 32
    nw = (int(w * scale + 0.5) + 31) // 32 * 32
    clip = np.stack([
        cv2.resize(cv2.cvtColor(f, cv2.COLOR_BGR2RGB), (nw, nh)) for f in frames
    ]).astype(np.float32)[None]  # (1, T, H, W, 3)

    batch = jnp.asarray(clip)
    params = model.init({"params": jax.random.PRNGKey(0)}, batch, None,
                        train=False)
    if cfg.MODEL.WEIGHTS:
        from mp_former_tpu.engine.checkpoint_import import load_reference_weights
        params = {"params": load_reference_weights(cfg.MODEL.WEIGHTS,
                                                   params["params"])}
    out = model.apply(params, batch, None, train=False)
    logits = np.asarray(out["pred_logits"][0])     # (Q, K+1)
    masks = out["pred_masks"][0]                   # (Q, T, h4, w4)

    # top-10 tube predictions (reference inference_video :255-287)
    import scipy.special
    scores = scipy.special.softmax(logits, -1)[:, :-1]
    k = cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES
    flat = scores.reshape(-1)
    top = np.argsort(-flat)[:10]
    tube_scores = flat[top]
    tube_classes = top % k
    tube_q = top // k

    up = resize(masks, (h, w), "bilinear")
    tubes = np.asarray(up)[tube_q] > 0  # (10, T, H, W), track-major

    # per-track consistent colors + contours + labels
    # (reference demo_video/visualizer.py TrackVisualizer :13)
    from visualizer import TrackVisualizer

    from mp_former_tpu.data.catalog import MetadataCatalog

    thing_classes = None
    if cfg.DATASETS.TEST:
        thing_classes = MetadataCatalog.get(
            cfg.DATASETS.TEST[0]).get("thing_classes")
    vis = TrackVisualizer(thing_classes)
    rendered = vis.draw_clip(frames, tubes, tube_classes, tube_scores,
                             score_threshold=args.confidence_threshold)
    for t, img in enumerate(rendered):
        cv2.imwrite(os.path.join(args.output, f"frame_{t:04d}.jpg"), img)
    print(f"wrote {len(rendered)} visualized frames -> {args.output}")


if __name__ == "__main__":
    main()
