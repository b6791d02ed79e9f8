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
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = p.parse_args()
    if not (args.input or args.video_input or args.webcam):
        p.error("one of --input / --video-input / --webcam is required")

    import jax
    import jax.numpy as jnp

    from mp_former_tpu.config import (add_deeplab_config, add_maskformer2_config,
                                      get_cfg)
    from mp_former_tpu.data.catalog import MetadataCatalog
    from mp_former_tpu.engine.checkpoint_import import load_reference_weights
    from mp_former_tpu.engine.eval_loop import postprocess_instance
    from mp_former_tpu.inference import semantic_inference
    from mp_former_tpu.models import build_model

    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts or [])
    model = build_model(cfg)
    os.makedirs(args.output, exist_ok=True)

    params = None
    fwd = jax.jit(lambda p, im: model.apply(p, im, None, train=False))

    def frame_iter():
        if args.input:
            for path in args.input:
                yield path, cv2.imread(path)
        elif args.video_input or args.webcam:
            cap = cv2.VideoCapture(0 if args.webcam else args.video_input)
            i = 0
            while cap.isOpened() and i < args.max_frames:
                ok, frame = cap.read()
                if not ok:
                    break
                yield f"frame_{i:05d}.jpg", frame
                i += 1
            cap.release()

    for path, img in frame_iter():
        if img is None:
            print(f"could not read {path}")
            continue
        h, w = img.shape[:2]
        scale = cfg.INPUT.MIN_SIZE_TEST / min(h, w)
        nh = int(h * scale + 0.5 + 31) // 32 * 32
        nw = int(w * scale + 0.5 + 31) // 32 * 32
        resized = cv2.resize(cv2.cvtColor(img, cv2.COLOR_BGR2RGB), (nw, nh))
        batch = jnp.asarray(resized[None].astype(np.float32))
        if params is None:
            params = model.init({"params": jax.random.PRNGKey(0)}, batch,
                                None, train=False)
            if cfg.MODEL.WEIGHTS:
                params = {"params": load_reference_weights(
                    cfg.MODEL.WEIGHTS, params["params"])}
        out = fwd(params, batch)
        logits = np.asarray(out["pred_logits"][0])
        masks = np.asarray(out["pred_masks"][0])
        base = os.path.join(args.output, os.path.basename(path))
        if cfg.MODEL.MASK_FORMER.TEST.INSTANCE_ON:
            scores, classes, bin_masks = postprocess_instance(
                logits, masks, (nh, nw), h, w,
                cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
                cfg.TEST.DETECTIONS_PER_IMAGE)
            vis = overlay_instances(img, scores, classes, bin_masks,
                                    threshold=args.confidence_threshold)
            cv2.imwrite(base.replace(".", "_instance.", 1), vis)
        if cfg.MODEL.MASK_FORMER.TEST.SEMANTIC_ON:
            from mp_former_tpu.utils.interp import resize as jresize

            m = jresize(jnp.asarray(masks), (h, w), "bilinear")
            sem = np.asarray(semantic_inference(jnp.asarray(logits), m))
            cv2.imwrite(base.replace(".", "_semantic.", 1),
                        overlay_semantic(img, sem))
        print(f"wrote visualizations for {path}")


if __name__ == "__main__":
    main()
