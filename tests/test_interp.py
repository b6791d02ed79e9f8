"""Torch-parity tests for the interpolation/sampling library.

The reference depends on exact F.interpolate / grid_sample semantics
(SURVEY.md §7 'hard parts'); these tests pin our implementations to torch.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from mp_former_tpu.utils.interp import resize, grid_sample, point_sample
from mp_former_tpu.utils.boxes import masks_to_boxes, box_xyxy_to_cxcywh

RNG = np.random.RandomState(0)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((32, 32), (64, 64)),      # 2x up (attn-mask to level size)
    ((256, 256), (100, 136)),  # odd down
    ((17, 23), (51, 69)),      # 3x up, non-multiples
    ((64, 48), (16, 12)),      # 4x down
    ((7, 7), (7, 7)),          # identity
])
def test_bilinear_matches_torch(in_hw, out_hw):
    x = RNG.randn(2, 3, *in_hw).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=out_hw, mode="bilinear",
                         align_corners=False).numpy()
    got = np.asarray(resize(jnp.asarray(x), out_hw, "bilinear"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((64, 64), (32, 32)),
    ((100, 152), (25, 38)),
    ((33, 47), (13, 11)),      # non-integer ratio (DN mask downsample case)
])
def test_area_matches_torch(in_hw, out_hw):
    x = RNG.randn(2, 4, *in_hw).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=out_hw, mode="area").numpy()
    got = np.asarray(resize(jnp.asarray(x), out_hw, "area"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((32, 32), (64, 64)),
    ((64, 64), (23, 45)),
    ((15, 9), (30, 18)),
])
def test_nearest_matches_torch(in_hw, out_hw):
    x = RNG.randn(1, 2, *in_hw).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=out_hw, mode="nearest").numpy()
    got = np.asarray(resize(jnp.asarray(x), out_hw, "nearest"))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_matches_torch(align_corners):
    B, C, H, W, P = 2, 8, 24, 40, 333
    x = RNG.randn(B, C, H, W).astype(np.float32)
    # include out-of-range points to exercise zero padding
    grid = (RNG.rand(B, P, 2).astype(np.float32) * 2.4 - 1.2)
    want = F.grid_sample(
        torch.from_numpy(x), torch.from_numpy(grid).unsqueeze(2),
        mode="bilinear", padding_mode="zeros", align_corners=align_corners,
    ).squeeze(-1).numpy()  # (B, C, P)
    got = grid_sample(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(grid),
                      align_corners=align_corners)  # (B, P, C)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want, rtol=1e-4, atol=1e-5)


def test_point_sample_matches_point_rend_convention():
    """point_sample(x, coords) == grid_sample(x, 2*coords-1) — the exact
    transform in detectron2 point_rend (used by matcher.py:122-132)."""
    B, C, H, W, P = 2, 4, 16, 16, 64
    x = RNG.randn(B, C, H, W).astype(np.float32)
    coords = RNG.rand(B, P, 2).astype(np.float32)
    want = F.grid_sample(
        torch.from_numpy(x), (2.0 * torch.from_numpy(coords) - 1.0).unsqueeze(2),
        mode="bilinear", padding_mode="zeros", align_corners=False,
    ).squeeze(-1).numpy()
    got = point_sample(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want, rtol=1e-4, atol=1e-5)


def test_masks_to_boxes():
    masks = np.zeros((3, 20, 30), dtype=np.float32)
    masks[0, 2:5, 4:9] = 1.0
    masks[1, 0:20, 0:1] = 1.0
    # masks[2] empty
    got = np.asarray(masks_to_boxes(jnp.asarray(masks)))
    np.testing.assert_array_equal(got[0], [4, 2, 8, 4])
    np.testing.assert_array_equal(got[1], [0, 0, 0, 19])
    np.testing.assert_array_equal(got[2], [0, 0, 0, 0])


def test_box_conversion():
    b = jnp.asarray([[0.0, 0.0, 4.0, 8.0]])
    np.testing.assert_allclose(np.asarray(box_xyxy_to_cxcywh(b)), [[2, 4, 4, 8]])
