"""TrackVisualizer: per-track color consistency across frames
(reference demo_video/visualizer.py:13)."""

import numpy as np

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "demo_video"))

from visualizer import TrackVisualizer, track_color  # noqa: E402


def test_track_color_stable_and_distinct():
    c0a, c0b = track_color(0), track_color(0)
    assert np.array_equal(c0a, c0b)
    colors = [tuple(track_color(i)) for i in range(40)]
    assert len(set(colors)) == 40  # all distinct, incl. beyond palette size


def test_draw_clip_consistent_colors():
    t, h, w = 3, 32, 32
    frames = [np.zeros((h, w, 3), np.uint8) for _ in range(t)]
    tubes = np.zeros((2, t, h, w), bool)
    tubes[0, :, 2:10, 2:10] = True     # track 0: static square
    for fi in range(t):                # track 1: moving square
        tubes[1, fi, 20:28, 2 + fi * 4: 10 + fi * 4] = True
    vis = TrackVisualizer(["cat", "dog"], draw_labels=False,
                          draw_contours=False)
    out = vis.draw_clip(frames, tubes, [0, 1], [0.9, 0.8])
    assert len(out) == t
    # track 0's interior pixel keeps one color across all frames
    px = [tuple(o[5, 5]) for o in out]
    assert len(set(px)) == 1 and px[0] != (0, 0, 0)
    # track 1's pixel (wherever it is) differs from track 0's color
    p1 = tuple(out[0][24, 5])
    assert p1 != px[0] and p1 != (0, 0, 0)


def test_score_threshold_filters():
    frames = [np.zeros((16, 16, 3), np.uint8)]
    tubes = np.ones((1, 1, 16, 16), bool)
    vis = TrackVisualizer(None, draw_labels=False, draw_contours=False)
    out = vis.draw_clip(frames, tubes, [0], [0.3], score_threshold=0.5)
    assert np.array_equal(out[0], frames[0])
