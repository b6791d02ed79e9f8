"""Dataset-mapper consistency tests: geometry applied to image, masks,
sem-seg, and boxes agree; static output shapes hold."""

import numpy as np
import pytest

from mp_former_tpu.config import get_cfg, add_deeplab_config, add_maskformer2_config
from mp_former_tpu.data.transforms import (
    TransformRecord, apply_record_to_image, lsj_transform, resize_shortest_edge)
from mp_former_tpu.data.dataset_mappers.coco_instance_new_baseline import (
    _mask_from_segmentation, _transform_bitmask)


def test_lsj_record_consistency():
    rng = np.random.RandomState(0)
    h, w = 200, 300
    rec = lsj_transform(rng, h, w, image_size=128, min_scale=0.5, max_scale=1.5)
    img = np.zeros((h, w, 3), np.uint8)
    img[50:100, 100:200] = 255
    out = apply_record_to_image(img, rec, pad_value=0.0)
    assert out.shape == (128, 128, 3)

    # a rectangle polygon lands where the rasterized mask lands
    poly = [np.array([100.0, 50.0, 200.0, 50.0, 200.0, 100.0, 100.0, 100.0])]
    m = _mask_from_segmentation([p.tolist() for p in poly], rec)
    assert m.shape == (128, 128)
    # mask must overlap the bright image region (same geometry applied)
    bright = out[:, :, 0] > 128
    if m.any() and bright.any():
        inter = (m & bright).sum()
        union = (m | bright).sum()
        assert inter / union > 0.6


def test_bitmask_vs_polygon_transform_agree():
    rng = np.random.RandomState(1)
    h, w = 100, 140
    rec = resize_shortest_edge(rng, h, w, [64], 96, flip=True)
    mask = np.zeros((h, w), bool)
    mask[20:60, 30:90] = True
    tm = _transform_bitmask(mask, rec)
    poly = [np.array([30.0, 20.0, 90.0, 20.0, 90.0, 60.0, 30.0, 60.0])]
    pm = _mask_from_segmentation([p.tolist() for p in poly], rec)
    inter = (tm & pm).sum()
    union = (tm | pm).sum()
    assert union > 0 and inter / union > 0.7


def test_semantic_mapper_static_shapes(tmp_path):
    import cv2

    from mp_former_tpu.data.dataset_mappers.mask_former_mappers import (
        MaskFormerSemanticDatasetMapper)

    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    cfg.merge_from_list([
        "INPUT.MIN_SIZE_TRAIN", "(64,)",
        "INPUT.MAX_SIZE_TRAIN", "128",
        "INPUT.CROP.ENABLED", "True",
        "INPUT.CROP.TYPE", "absolute",
        "INPUT.CROP.SIZE", "(64, 64)",
        "INPUT.COLOR_AUG_SSD", "True",
        "INPUT.SIZE_DIVISIBILITY", "64",
    ])
    img = (np.random.RandomState(0).rand(120, 160, 3) * 255).astype(np.uint8)
    sem = np.random.RandomState(1).randint(0, 5, (120, 160)).astype(np.uint8)
    f_img = str(tmp_path / "im.jpg")
    f_sem = str(tmp_path / "sem.png")
    cv2.imwrite(f_img, img)
    cv2.imwrite(f_sem, sem)
    mapper = MaskFormerSemanticDatasetMapper(cfg, max_instances=8)
    s = mapper({"file_name": f_img, "sem_seg_file_name": f_sem, "image_id": 0},
               np.random.RandomState(2))
    assert s["image"].shape == (64, 64, 3)
    assert s["sem_seg"].shape == (64, 64)
    # grid-mode default rasterizes GT masks at 1/4 canvas (TPU.GT_MASK_STRIDE)
    assert s["masks"].shape == (8, 16, 16)
    # class masks cover the labeled area (any-pooled to the strided grid —
    # any-pool distributes over the union of the per-class masks)
    from mp_former_tpu.data.transforms import block_any_pool

    labeled = block_any_pool(s["sem_seg"] != 255, 4)
    union = np.zeros((16, 16), bool)
    for i in range(8):
        if s["valid"][i]:
            union |= s["masks"][i]
    np.testing.assert_array_equal(union, labeled)


def test_strided_gt_keeps_thin_structures(tmp_path):
    """A 1-px-wide class line must survive GT_MASK_STRIDE=4 (any-pooling;
    [::4] point sampling could delete it entirely)."""
    import cv2

    from mp_former_tpu.data.dataset_mappers.mask_former_mappers import (
        MaskFormerSemanticDatasetMapper)

    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    cfg.merge_from_list([
        "INPUT.MIN_SIZE_TRAIN", "(64,)",
        "INPUT.MAX_SIZE_TRAIN", "64",
        "INPUT.COLOR_AUG_SSD", "False",
        "INPUT.SIZE_DIVISIBILITY", "64",
        "INPUT.RANDOM_FLIP", "none",
    ])
    img = np.full((64, 64, 3), 127, np.uint8)
    sem = np.zeros((64, 64), np.uint8)
    sem[13, :] = 7  # 1-px horizontal line, off the stride-4 sample grid
    f_img, f_sem = str(tmp_path / "t.jpg"), str(tmp_path / "t.png")
    cv2.imwrite(f_img, img)
    cv2.imwrite(f_sem, sem)
    mapper = MaskFormerSemanticDatasetMapper(cfg, max_instances=4)
    s = mapper({"file_name": f_img, "sem_seg_file_name": f_sem, "image_id": 0},
               np.random.RandomState(0))
    got = set(s["labels"][s["valid"]].tolist())
    assert 7 in got, got


def test_train_loader_surfaces_mapper_errors():
    """A mapper exception must raise in __next__, not hang the consumer."""
    import pytest

    from mp_former_tpu.data.loader import TrainLoader

    def bad_mapper(rec, rng):
        raise ValueError("boom")

    loader = TrainLoader([{"id": 1}], bad_mapper, batch_size=1, num_workers=1)
    with pytest.raises(RuntimeError, match="producer thread died"):
        next(loader)
    loader.close()


def test_train_loader_groups_by_shape():
    """Mixed-shape samples (e.g. landscape/portrait canvases) batch only
    with same-shape peers (the analog of d2 aspect-ratio grouping)."""
    from mp_former_tpu.data.loader import TrainLoader

    def mapper(rec, rng):
        s = rec["shape"]
        return {"image": np.zeros(s, np.float32),
                "labels": np.zeros(2, np.int32),
                "masks": np.zeros((2, 4, 4), bool),
                "boxes": np.zeros((2, 4), np.float32),
                "valid": np.ones(2, bool)}

    records = [{"shape": (8, 16, 3)}, {"shape": (16, 8, 3)}] * 4
    loader = TrainLoader(records, mapper, batch_size=2, num_workers=1,
                         filter_empty=False)
    for _ in range(4):
        b = next(loader)
        assert b.images.shape[1:] in ((8, 16, 3), (16, 8, 3))
    loader.close()
