"""Streamed fused instance eval (TPU.EVAL_STREAM) == legacy per-image path.

The fused program (engine/eval_loop._instance_fused_forward) runs the
forward AND the reference-order instance post-processing for a stream of
same-shape images in one jit invocation, returning bit-packed masks. It
must reproduce the legacy path (per-image jitted forward + eager
postprocess_instance) exactly: same upsample->crop->resize->topk->scoring
op order, just batched/fused.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mp_former_tpu.config import (add_deeplab_config, add_maskformer2_config,
                                  get_cfg)
from mp_former_tpu.engine.eval_loop import (_eval_forward,
                                            _instance_fused_forward,
                                            postprocess_instance)
from mp_former_tpu.models import build_model


@pytest.fixture(scope="module")
def eval_model():
    import os

    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    ref = ("/root/reference/configs/coco/instance-segmentation/"
           "maskformer2_R50_bs16_50ep.yaml")
    if os.path.exists(ref):
        cfg.merge_from_file(ref)
    cfg.merge_from_list([
        "MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS", "1",
        "MODEL.MASK_FORMER.DEC_LAYERS", "3",
        "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "10",
        "MODEL.SEM_SEG_HEAD.NUM_CLASSES", "7",
    ])
    model = build_model(cfg)
    images = jnp.asarray(
        np.random.RandomState(0).rand(1, 64, 64, 3) * 255, jnp.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dn": jax.random.PRNGKey(1)},
        images, None, train=False)
    return cfg, model, params


def test_fused_stream_matches_legacy(eval_model):
    cfg, model, params = eval_model
    num_classes, topk = 7, 15
    img_h, img_w = 60, 64      # resized size inside the padded 64x64 canvas
    out_h, out_w = 120, 97     # odd width: exercises bit padding + count crop
    rng = np.random.RandomState(1)
    imgs = [rng.rand(64, 64, 3).astype(np.float32) * 255 for _ in range(3)]

    # legacy: per-image jitted forward + eager post-processing
    fwd = _eval_forward(model)
    legacy = []
    for im in imgs:
        lg, mk = fwd(params, jnp.asarray(im[None]))
        legacy.append(postprocess_instance(
            np.asarray(lg[0]), np.asarray(mk[0]), (img_h, img_w),
            out_h, out_w, num_classes, topk))

    # fused: stream of 2 per invocation, D=1, padded tail (4th = repeat)
    fused = _instance_fused_forward(model)
    stack = np.stack(imgs + [imgs[-1]]).reshape(2, 2, 64, 64, 3)
    sc, cls, pm = fused(params, jnp.asarray(stack), img_h=img_h, img_w=img_w,
                        out_h=out_h, out_w=out_w, num_classes=num_classes,
                        topk=topk)
    assert pm.shape == (2, 2, topk, out_h, (out_w + 7) // 8)
    sc = np.asarray(sc).reshape(4, topk)
    cls = np.asarray(cls).reshape(4, topk)
    pm = np.asarray(pm).reshape(4, topk, out_h, -1)

    for i, (l_sc, l_cls, l_masks) in enumerate(legacy):
        np.testing.assert_allclose(sc[i], l_sc, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(cls[i], l_cls)
        got = np.unpackbits(pm[i], axis=-1, count=out_w).astype(bool)
        assert got.shape == l_masks.shape
        # binarization at threshold 0: allow a vanishing fp-reassociation
        # fringe on mask boundaries, nothing more
        mismatch = (got != l_masks).mean()
        assert mismatch < 1e-4, f"image {i}: mask mismatch rate {mismatch}"
    # padded tail slot equals the repeated last image's result
    np.testing.assert_allclose(sc[3], sc[2], rtol=1e-5, atol=1e-6)


def test_pack_bitmask_device_roundtrip():
    from mp_former_tpu.structures import pack_bitmask_device

    rng = np.random.RandomState(2)
    for w in (8, 16, 97):  # aligned and ragged widths
        a = rng.rand(3, 5, w) > 0.5
        p = np.asarray(pack_bitmask_device(jnp.asarray(a)))
        assert p.shape == (3, 5, (w + 7) // 8) and p.dtype == np.uint8
        got = np.unpackbits(p, axis=-1, count=w).astype(bool)
        assert (got == a).all()
        # matches the host packer bit order on aligned widths
        if w % 8 == 0:
            assert (p == np.packbits(a, axis=-1)).all()


def test_diverse_original_sizes_delegate_to_legacy(tmp_path):
    """Real datasets have many distinct original sizes; under-filled fused
    size groups must delegate to the per-image path (no per-size whole-
    program compile) and produce identical evaluation results."""
    import json

    import cv2

    from mp_former_tpu.config import get_cfg as _get_cfg
    from mp_former_tpu.data.datasets.coco import register_coco_instances
    from mp_former_tpu.engine.eval_loop import run_evaluation
    from mp_former_tpu.models import build_model as _build

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(3)
    images, annotations = [], []
    # five images, five distinct original sizes -> every fused size group is
    # a singleton and takes the delegation path
    sizes = [(100, 120), (101, 121), (102, 122), (103, 123), (104, 124)]
    for i, (h, w) in enumerate(sizes):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        img[20:60, 30:80] = (255, 0, 0)
        annotations.append({
            "id": i + 1, "image_id": i, "category_id": 1,
            "bbox": [30, 20, 50, 40], "area": 2000, "iscrowd": 0,
            "segmentation": [[30, 20, 80, 20, 80, 60, 30, 60]],
        })
        fn = f"{i:06d}.jpg"
        cv2.imwrite(str(img_dir / fn), img)
        images.append({"id": i, "file_name": fn, "height": h, "width": w})
    jf = tmp_path / "instances.json"
    jf.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": 1, "name": "red"}],
    }))
    name = "synthetic_coco_diverse_sizes"
    register_coco_instances(name, str(jf), str(img_dir))

    from mp_former_tpu.config import add_deeplab_config, add_maskformer2_config

    cfg = _get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    cfg.merge_from_list([
        "MODEL.RESNETS.OUT_FEATURES", "['res2','res3','res4','res5']",
        "MODEL.SEM_SEG_HEAD.NAME", "MaskFormerHead",
        "MODEL.SEM_SEG_HEAD.IN_FEATURES", "['res2','res3','res4','res5']",
        "MODEL.SEM_SEG_HEAD.PIXEL_DECODER_NAME", "MSDeformAttnPixelDecoder",
        "MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS", "1",
        "MODEL.SEM_SEG_HEAD.NUM_CLASSES", "1",
        "MODEL.SEM_SEG_HEAD.CONVS_DIM", "32",
        "MODEL.SEM_SEG_HEAD.MASK_DIM", "32",
        "MODEL.MASK_FORMER.TRANSFORMER_IN_FEATURE",
        "multi_scale_pixel_decoder",
        "MODEL.MASK_FORMER.HIDDEN_DIM", "32",
        "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "8",
        "MODEL.MASK_FORMER.NHEADS", "4",
        "MODEL.MASK_FORMER.DIM_FEEDFORWARD", "64",
        "MODEL.MASK_FORMER.DEC_LAYERS", "4",
        "MODEL.MASK_FORMER.DROPOUT", "0.0",
        "MODEL.MASK_FORMER.TEST.INSTANCE_ON", "True",
        "INPUT.MIN_SIZE_TEST", "64",
        "INPUT.MAX_SIZE_TEST", "96",
        "TEST.DETECTIONS_PER_IMAGE", "8",
        "DATASETS.TEST", f"('{name}',)",
    ])
    model = _build(cfg)
    dummy = jnp.zeros((1, 96, 96, 3), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, dummy, None,
                        train=False)

    cfg_legacy = cfg.clone()
    cfg_legacy.TPU.EVAL_STREAM = 1
    cfg_fused = cfg.clone()
    cfg_fused.TPU.EVAL_STREAM = 8

    legacy = run_evaluation(cfg_legacy, model, params, name)
    fused = run_evaluation(cfg_fused, model, params, name)

    def flatten(d, p=""):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out.update(flatten(v, p + str(k) + "/"))
            elif isinstance(v, (int, float, np.floating)):
                out[p + str(k)] = float(v)
        return out

    fl, ff = flatten(legacy), flatten(fused)
    assert set(fl) == set(ff)
    for k in fl:
        if np.isnan(fl[k]) and np.isnan(ff[k]):
            continue
        np.testing.assert_allclose(ff[k], fl[k], rtol=1e-6, err_msg=k)
