"""SemanticSegmentorWithTTA (reference test_time_augmentation.py:21-103):
multi-scale + horizontal-flip test-time augmentation for semantic
segmentation — run the model at each scale (and mirrored), resize the
per-class probability maps back to the original size, and average."""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .inference import semantic_inference
from .utils.interp import resize


class SemanticSegmentorWithTTA:
    def __init__(self, cfg, model, params,
                 min_sizes: Sequence[int] | None = None,
                 max_size: int | None = None, flip: bool = True):
        self.model = model
        self.params = params
        self.min_sizes = list(min_sizes or cfg.TEST.AUG.MIN_SIZES)
        self.max_size = max_size or cfg.TEST.AUG.MAX_SIZE
        self.flip = flip if flip is not None else cfg.TEST.AUG.FLIP
        self.num_classes = cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES

        @jax.jit
        def fwd(p, im):
            out = model.apply(p, im, None, train=False)
            return out["pred_logits"], out["pred_masks"]

        self._fwd = fwd

    def _one_scale(self, image: np.ndarray, size: int) -> List[np.ndarray]:
        import cv2

        h, w = image.shape[:2]
        scale = size / min(h, w)
        nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
        if max(nh, nw) > self.max_size:
            s = self.max_size / max(nh, nw)
            nh, nw = int(nh * s), int(nw * s)
        nh = (nh + 31) // 32 * 32
        nw = (nw + 31) // 32 * 32
        resized = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
        variants = [resized]
        if self.flip:
            variants.append(resized[:, ::-1].copy())
        outs = []
        for i, v in enumerate(variants):
            logits, masks = self._fwd(
                self.params, jnp.asarray(v[None].astype(np.float32)))
            masks = resize(masks, (h, w), "bilinear")
            sem = semantic_inference(logits[0], masks[0])  # (K, H, W)
            sem = np.asarray(sem)
            if i == 1:
                sem = sem[:, :, ::-1]
            outs.append(sem)
        return outs

    def __call__(self, image: np.ndarray) -> np.ndarray:
        """image: (H, W, 3) RGB uint8 -> averaged (K, H, W) semantic probs."""
        acc = None
        n = 0
        for size in self.min_sizes:
            for sem in self._one_scale(image, size):
                acc = sem if acc is None else acc + sem
                n += 1
        return acc / n
