"""Native (C++) components, loaded via ctypes.

`maskapi`: COCO mask API equivalent (polygon rasterization, RLE codec, RLE
IoU) — the TPU-framework counterpart of pycocotools' C extension the
reference depends on. Built on first use with g++ -O3; falls back cleanly if
no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "libmaskapi.so")
_SRC = os.path.join(_HERE, "maskapi.cc")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    global _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.polys_to_mask.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.mask_to_rle.restype = ctypes.c_int
        lib.rle_area.restype = ctypes.c_double
        lib.rle_iou.restype = ctypes.c_double
        return lib
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None:
        _lib = _build()
    return _lib


def polygons_to_mask_native(polygons: List[np.ndarray], h: int, w: int
                            ) -> Optional[np.ndarray]:
    """COCO-style polygon rasterization. Returns None if the native lib is
    unavailable (callers fall back to cv2)."""
    lib = get_lib()
    if lib is None:
        return None
    flat = [np.asarray(p, np.float64).reshape(-1) for p in polygons
            if len(p) >= 6]
    if not flat:
        return np.zeros((h, w), bool)
    xy = np.concatenate(flat)
    sizes = np.asarray([len(f) // 2 for f in flat], np.int32)
    out = np.zeros((w, h), np.uint8)  # column-major (w cols of h)
    lib.polys_to_mask(
        xy.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        len(sizes), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.T.astype(bool)


def mask_to_rle(mask: np.ndarray) -> np.ndarray:
    """(H, W) bool -> COCO uncompressed counts (column-major)."""
    lib = get_lib()
    h, w = mask.shape
    col = np.asfortranarray(mask.astype(np.uint8)).T.reshape(-1)
    col = np.ascontiguousarray(mask.astype(np.uint8).T.reshape(-1))
    if lib is None:
        # numpy fallback
        diff = np.nonzero(np.diff(col))[0] + 1
        edges = np.concatenate([[0], diff, [col.size]])
        return np.diff(edges).astype(np.uint32)
    counts = np.zeros(h * w + 1, np.uint32)
    k = lib.mask_to_rle(
        col.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    return counts[:k].copy()


def rle_iou(a: np.ndarray, b: np.ndarray, iscrowd: bool = False) -> float:
    lib = get_lib()
    a = np.ascontiguousarray(a, np.uint32)
    b = np.ascontiguousarray(b, np.uint32)
    if lib is None:
        raise RuntimeError("native maskapi unavailable")
    return lib.rle_iou(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(a),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(b),
        int(iscrowd))
