"""TrackVisualizer — per-track consistent video instance visualization
(reference demo_video/visualizer.py:13, which subclasses the d2 Visualizer).

cv2-based: each track id maps to one stable color for the whole clip
(deterministic palette + per-id jitter like the reference's _ID_JITTERS
table); masks are alpha-blended, outlined, and labeled "[id] class score".
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

# distinct base palette (RGB, 0-255); tracks cycle through it with a
# deterministic per-id jitter so ids beyond the palette stay distinguishable
_BASE_PALETTE = np.array([
    (220, 20, 60), (0, 130, 200), (60, 180, 75), (255, 225, 25),
    (245, 130, 48), (145, 30, 180), (70, 240, 240), (240, 50, 230),
    (210, 245, 60), (250, 190, 190), (0, 128, 128), (230, 190, 255),
    (170, 110, 40), (255, 250, 200), (128, 0, 0), (170, 255, 195),
    (128, 128, 0), (255, 215, 180), (0, 0, 128), (128, 128, 128),
], np.float64)


def track_color(track_id: int) -> np.ndarray:
    """Stable RGB color for a track id (same id -> same color every frame)."""
    base = _BASE_PALETTE[track_id % len(_BASE_PALETTE)]
    rng = np.random.RandomState(track_id)
    jitter = (rng.rand(3) - 0.5) * 60.0 * (track_id // len(_BASE_PALETTE))
    return np.clip(base + jitter, 0, 255)


class TrackVisualizer:
    def __init__(self, thing_classes: Optional[Sequence[str]] = None,
                 alpha: float = 0.5, draw_contours: bool = True,
                 draw_labels: bool = True):
        self.thing_classes = thing_classes
        self.alpha = alpha
        self.draw_contours = draw_contours
        self.draw_labels = draw_labels

    def _label(self, track_id: int, cls: int, score: float) -> str:
        name = (self.thing_classes[cls]
                if self.thing_classes and 0 <= cls < len(self.thing_classes)
                else str(cls))
        return f"[{track_id}] {name} {score:.0%}"

    def draw_frame(self, frame_bgr: np.ndarray, masks: List[np.ndarray],
                   track_ids: Sequence[int], classes: Sequence[int],
                   scores: Sequence[float]) -> np.ndarray:
        """frame_bgr (H, W, 3) uint8; masks: per-track bool (H, W) for THIS
        frame. Returns the visualized frame (copy)."""
        import cv2

        vis = frame_bgr.astype(np.float64).copy()
        for m, tid, cls, sc in zip(masks, track_ids, classes, scores):
            m = m.astype(bool)
            if not m.any():
                continue
            color = track_color(int(tid))[::-1]  # RGB -> BGR
            vis[m] = (1 - self.alpha) * vis[m] + self.alpha * color
        vis = vis.astype(np.uint8)
        for m, tid, cls, sc in zip(masks, track_ids, classes, scores):
            m = m.astype(np.uint8)
            if not m.any():
                continue
            color = tuple(int(c) for c in track_color(int(tid))[::-1])
            if self.draw_contours:
                contours, _ = cv2.findContours(
                    m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
                cv2.drawContours(vis, contours, -1, color, 2)
            if self.draw_labels:
                ys, xs = np.nonzero(m)
                org = (int(xs.min()), max(int(ys.min()) - 4, 12))
                txt = self._label(int(tid), int(cls), float(sc))
                cv2.putText(vis, txt, org, cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                            (0, 0, 0), 3, cv2.LINE_AA)
                cv2.putText(vis, txt, org, cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                            (255, 255, 255), 1, cv2.LINE_AA)
        return vis

    def draw_clip(self, frames_bgr: List[np.ndarray], tubes: np.ndarray,
                  classes: Sequence[int], scores: Sequence[float],
                  score_threshold: float = 0.5) -> List[np.ndarray]:
        """tubes: (N, T, H, W) bool — per-track masks over the whole clip.
        Track i keeps color i in every frame."""
        keep = [i for i, s in enumerate(scores) if s >= score_threshold]
        out = []
        for t, frame in enumerate(frames_bgr):
            out.append(self.draw_frame(
                frame,
                [tubes[i, t] for i in keep],
                keep,
                [classes[i] for i in keep],
                [scores[i] for i in keep]))
        return out
