"""Native maskapi: RLE roundtrip/IoU exactness, polygon fill vs cv2."""

import numpy as np
import pytest

from mp_former_tpu.native import (get_lib, mask_to_rle, polygons_to_mask_native,
                                  rle_iou)
from mp_former_tpu.data.transforms import polygons_to_bitmask

pytestmark = pytest.mark.skipif(get_lib() is None, reason="no g++ available")


def test_rle_roundtrip():
    rng = np.random.RandomState(0)
    mask = rng.rand(37, 53) > 0.6
    counts = mask_to_rle(mask)
    # decode via numpy and compare
    flat = np.zeros(mask.size, np.uint8)
    pos, val = 0, 0
    for c in counts:
        flat[pos:pos + c] = val
        pos += int(c)
        val = 1 - val
    np.testing.assert_array_equal(flat.reshape(53, 37).T, mask.astype(np.uint8))
    assert counts.sum() == mask.size


def test_rle_iou_matches_numpy():
    rng = np.random.RandomState(1)
    a = rng.rand(40, 40) > 0.5
    b = rng.rand(40, 40) > 0.5
    ra, rb = mask_to_rle(a), mask_to_rle(b)
    want = (a & b).sum() / (a | b).sum()
    got = rle_iou(ra, rb)
    assert abs(got - want) < 1e-12
    # crowd: intersection / area(a)
    got_c = rle_iou(ra, rb, iscrowd=True)
    assert abs(got_c - (a & b).sum() / a.sum()) < 1e-12


def test_polygon_fill_close_to_cv2():
    poly = [np.array([4.0, 4.0, 28.0, 6.0, 30.0, 30.0, 6.0, 26.0])]
    native = polygons_to_mask_native(poly, 36, 36)
    ref = polygons_to_bitmask(poly, 36, 36)
    # rasterizers differ at most along the boundary
    diff = native ^ ref
    assert native.sum() > 200
    assert diff.sum() <= 0.15 * ref.sum()


def test_polygon_rect_exact():
    # axis-aligned rectangle with integer corners: both halves of the
    # boundary convention agree inside
    poly = [np.array([5.0, 5.0, 20.0, 5.0, 20.0, 15.0, 5.0, 15.0])]
    m = polygons_to_mask_native(poly, 24, 24)
    assert m[7, 7] and m[14, 19]
    assert not m[2, 2] and not m[20, 22]
    area = m.sum()
    assert 140 <= area <= 260  # 15x10 rect ± boundary convention
