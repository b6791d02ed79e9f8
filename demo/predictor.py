"""Predictor utilities for the demo (reference demo/predictor.py).

- `Predictor` — the DefaultPredictor role: cfg -> model + weights, takes one
  BGR image, returns instance/semantic/panoptic outputs at original size.
- `AsyncPredictor` (reference :131-220) — the reference pipelines frames
  across GPU worker processes; a TPU chip is owned by one process, so the
  TPU-native equivalent pipelines HOST work (decode/resize/visualize) against
  device compute with a background thread and the same put()/get() queue API.
- `VisualizationDemo` (reference :17-128) — run_on_image / run_on_video.
"""

from __future__ import annotations

import os
import queue
import sys
import threading

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


class Predictor:
    """cfg + MODEL.WEIGHTS -> callable(image_bgr) -> outputs dict."""

    def __init__(self, cfg):
        import jax

        from mp_former_tpu.models import build_model

        self.cfg = cfg
        self.model = build_model(cfg)
        self.params = None
        self._fwd = jax.jit(
            lambda p, im: self.model.apply(p, im, None, train=False))

    def _lazy_init(self, batch):
        import jax

        from mp_former_tpu.engine.checkpoint_import import load_reference_weights

        if self.params is not None:
            return
        self.params = self.model.init(
            {"params": jax.random.PRNGKey(0)}, batch, None, train=False)
        if self.cfg.MODEL.WEIGHTS:
            self.params = {"params": load_reference_weights(
                self.cfg.MODEL.WEIGHTS, self.params["params"])}

    def forward_raw(self, image_bgr: np.ndarray):
        """(logits (Q, K+1), masks (Q, h4, w4), resized (h, w) pre-padding)
        — the shared raw forward for demo and predict.py pipelines."""
        import jax.numpy as jnp

        from mp_former_tpu.engine.eval_loop import preprocess_image

        # shared eval preprocessing: shortest-edge + MAX_SIZE_TEST cap,
        # INPUT.FORMAT channel order, mean padding to /32
        canvas, image_size = preprocess_image(self.cfg, image_bgr)
        batch = jnp.asarray(canvas[None])
        self._lazy_init(batch)
        out = self._fwd(self.params, batch)
        return (np.asarray(out["pred_logits"][0]),
                np.asarray(out["pred_masks"][0]), image_size)

    def __call__(self, image_bgr: np.ndarray) -> dict:
        from mp_former_tpu.engine.eval_loop import (postprocess_instance,
                                                    postprocess_semantic,
                                                    semantic_before_inference)

        cfg = self.cfg
        h, w = image_bgr.shape[:2]
        logits, masks, image_size = self.forward_raw(image_bgr)
        res = {}
        if cfg.MODEL.MASK_FORMER.TEST.INSTANCE_ON:
            scores, classes, bin_masks = postprocess_instance(
                logits, masks, image_size, h, w,
                cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
                cfg.TEST.DETECTIONS_PER_IMAGE)
            res["instances"] = {
                "scores": scores, "classes": classes, "masks": bin_masks}
        if cfg.MODEL.MASK_FORMER.TEST.SEMANTIC_ON:
            res["sem_seg"] = np.asarray(postprocess_semantic(
                logits, masks, image_size, h, w,
                before_inference=semantic_before_inference(cfg)))
        return res


class AsyncPredictor:
    """put()/get() frame pipeline (reference AsyncPredictor :131-220).

    One background thread owns the device; callers overlap their own decode
    and visualization with its compute. Results come back in submit order.
    """

    _STOP = object()

    def __init__(self, cfg, num_workers: int = 1):
        self.predictor = Predictor(cfg)
        self._tasks: "queue.Queue" = queue.Queue(maxsize=max(num_workers, 1) * 3)
        self._results: "queue.Queue" = queue.Queue()
        self._submitted = 0
        self._returned = 0
        self._thread = threading.Thread(target=self._work, daemon=True)
        self._thread.start()

    def _work(self):
        while True:
            item = self._tasks.get()
            if item is self._STOP:
                return
            idx, frame = item
            try:
                self._results.put((idx, self.predictor(frame)))
            except Exception as e:  # surface errors at get()
                self._results.put((idx, e))

    def put(self, image_bgr: np.ndarray):
        self._tasks.put((self._submitted, image_bgr))
        self._submitted += 1

    def get(self):
        idx, res = self._results.get()
        self._returned += 1
        if isinstance(res, Exception):
            raise res
        return res

    def __len__(self):
        """In-flight frames (submitted, not yet returned)."""
        return self._submitted - self._returned

    def shutdown(self):
        self._tasks.put(self._STOP)
        self._thread.join()

    def __call__(self, image_bgr: np.ndarray):
        self.put(image_bgr)
        return self.get()


class VisualizationDemo:
    """Image/video visualization (reference VisualizationDemo :17-128)."""

    def __init__(self, cfg, parallel: bool = False):
        self.cfg = cfg
        self.predictor = AsyncPredictor(cfg) if parallel else Predictor(cfg)
        self.threshold = 0.5

    # -- drawing -------------------------------------------------------
    @staticmethod
    def _palette(n, seed=7):
        return np.random.RandomState(seed).randint(
            64, 255, size=(n, 3), dtype=np.uint8)

    def draw(self, image_bgr, predictions, class_names=None):
        import cv2

        out = image_bgr.copy()
        inst = predictions.get("instances")
        if inst is not None and len(inst["scores"]):
            colors = self._palette(len(inst["scores"]))
            for i in np.argsort(inst["scores"]):
                if inst["scores"][i] < self.threshold:
                    continue
                m = inst["masks"][i].astype(bool)
                out[m] = (0.5 * out[m] + 0.5 * colors[i]).astype(np.uint8)
                ys, xs = np.nonzero(m)
                if len(ys):
                    name = (class_names[inst["classes"][i]] if class_names
                            else str(inst["classes"][i]))
                    cv2.putText(out, f"{name} {inst['scores'][i]:.2f}",
                                (int(xs.min()), max(int(ys.min()) - 3, 10)),
                                cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                                colors[i].tolist(), 1)
        elif "sem_seg" in predictions:
            seg = predictions["sem_seg"].argmax(0)
            colors = self._palette(int(seg.max()) + 1)
            out = (0.5 * out + 0.5 * colors[seg][:, :, ::-1]).astype(np.uint8)
        return out

    def run_on_image(self, image_bgr, class_names=None):
        predictions = self.predictor(image_bgr)
        return predictions, self.draw(image_bgr, predictions, class_names)

    def run_on_video(self, video_capture, class_names=None, max_frames=None):
        """Generator of (predictions, vis_frame); pipelined when parallel
        (reference run_on_video keeps a put-ahead buffer of in-flight
        frames — calling AsyncPredictor like a function would serialize)."""
        import collections

        def frames():
            i = 0
            while video_capture.isOpened():
                if max_frames is not None and i >= max_frames:
                    break
                ok, frame = video_capture.read()
                if not ok:
                    break
                yield frame
                i += 1

        if isinstance(self.predictor, AsyncPredictor):
            buffer_size = 5
            inflight = collections.deque()
            for frame in frames():
                inflight.append(frame)
                self.predictor.put(frame)
                if len(inflight) >= buffer_size:
                    f = inflight.popleft()
                    predictions = self.predictor.get()
                    yield predictions, self.draw(f, predictions, class_names)
            while inflight:
                f = inflight.popleft()
                predictions = self.predictor.get()
                yield predictions, self.draw(f, predictions, class_names)
        else:
            for frame in frames():
                predictions = self.predictor(frame)
                yield predictions, self.draw(frame, predictions, class_names)
