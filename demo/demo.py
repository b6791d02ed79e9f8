#!/usr/bin/env python
"""Image demo (reference demo/demo.py + predictor.py): run a config+weights
on images and write visualizations (instance / semantic / panoptic overlays).

Usage:
  python demo/demo.py --config-file <yaml> --input img1.jpg img2.jpg \
      --output out_dir [--confidence-threshold 0.5] [opts ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2
import numpy as np


def color_palette(n: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(64, 255, size=(n, 3), dtype=np.uint8)


def overlay_instances(image_bgr, scores, classes, masks, class_names=None,
                      threshold=0.5):
    out = image_bgr.copy()
    colors = color_palette(len(scores))
    for i in np.argsort(scores):
        if scores[i] < threshold:
            continue
        m = masks[i].astype(bool)
        out[m] = (0.5 * out[m] + 0.5 * colors[i]).astype(np.uint8)
        ys, xs = np.nonzero(m)
        if len(ys):
            name = (class_names[classes[i]] if class_names else str(classes[i]))
            cv2.putText(out, f"{name} {scores[i]:.2f}",
                        (int(xs.min()), max(int(ys.min()) - 3, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, colors[i].tolist(), 1)
    return out


def overlay_semantic(image_bgr, sem_probs):
    seg = sem_probs.argmax(0)
    colors = color_palette(int(seg.max()) + 1)
    overlay = colors[seg]
    return (0.5 * image_bgr + 0.5 * overlay[:, :, ::-1]).astype(np.uint8)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--input", nargs="+",
                   help="image paths (reference demo/demo.py --input)")
    p.add_argument("--video-input", help="video file: per-frame visualization")
    p.add_argument("--webcam", action="store_true",
                   help="camera 0 (reference --webcam)")
    p.add_argument("--output", default="demo_out")
    p.add_argument("--confidence-threshold", type=float, default=0.5)
    p.add_argument("--max-frames", type=int, default=100)
    p.add_argument("--parallel", action="store_true",
                   help="pipeline host work against device compute "
                        "(reference AsyncPredictor)")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = p.parse_args()
    if not (args.input or args.video_input or args.webcam):
        p.error("one of --input / --video-input / --webcam is required")

    from predictor import VisualizationDemo

    from mp_former_tpu.config import (add_deeplab_config, add_maskformer2_config,
                                      get_cfg)

    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts or [])
    os.makedirs(args.output, exist_ok=True)

    demo = VisualizationDemo(cfg, parallel=args.parallel)
    demo.threshold = args.confidence_threshold

    if args.input:
        for path in args.input:
            img = cv2.imread(path)
            if img is None:
                print(f"could not read {path}")
                continue
            predictions, vis = demo.run_on_image(img)
            base = os.path.join(args.output, os.path.basename(path))
            stem, ext = os.path.splitext(base)
            if "instances" in predictions:
                cv2.imwrite(f"{stem}_instance{ext}", vis)
            if "sem_seg" in predictions:
                cv2.imwrite(f"{stem}_semantic{ext}",
                            overlay_semantic(img, predictions["sem_seg"]))
            print(f"wrote visualizations for {path}")
    else:
        cap = cv2.VideoCapture(0 if args.webcam else args.video_input)
        for i, (_, vis) in enumerate(
                demo.run_on_video(cap, max_frames=args.max_frames)):
            cv2.imwrite(os.path.join(args.output, f"frame_{i:05d}.jpg"), vis)
            print(f"wrote frame {i}")
        cap.release()


if __name__ == "__main__":
    main()
