"""Compact host->device transfers: uint8 images + bit-packed GT masks.

The train loaders ship uint8 images and 8-packed bool masks (4-8x fewer
host-link bytes; this runtime also retains every transfer's host staging
buffer, so the shipped volume is leaked host RSS). The jitted step unpacks
on device (structures.unpack_batch_masks); the model upcasts integer
images. These tests pin exactness of both halves.
"""

import numpy as np

import jax
import jax.numpy as jnp

from mp_former_tpu.structures import (Targets, pack_bool_masks,
                                      unpack_batch_masks, unpack_bitmask)


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    a = rng.rand(2, 3, 5, 16) > 0.5
    p = pack_bool_masks(a)
    assert p.shape == (2, 3, 5, 2) and p.dtype == np.uint8
    assert (np.asarray(unpack_bitmask(jnp.asarray(p))) == a).all()


def test_pack_skips_ragged_width():
    a = np.random.RandomState(1).rand(2, 3, 5, 12) > 0.5  # 12 % 8 != 0
    assert pack_bool_masks(a) is a


def test_unpack_batch_masks_dispatch():
    from mp_former_tpu.engine.train_step import Batch

    rng = np.random.RandomState(2)
    masks = rng.rand(2, 4, 8, 16) > 0.5
    tg = Targets(labels=jnp.zeros((2, 4), jnp.int32),
                 masks=jnp.asarray(pack_bool_masks(masks)),
                 boxes=jnp.zeros((2, 4, 4), jnp.float32),
                 valid=jnp.ones((2, 4), bool))
    batch = Batch(images=jnp.zeros((2, 8, 8, 3), jnp.uint8), targets=tg)
    out = unpack_batch_masks(batch)
    assert out.targets.masks.dtype == jnp.bool_
    assert (np.asarray(out.targets.masks) == masks).all()
    # bool masks pass through untouched (manually built test batches)
    assert unpack_batch_masks(out) is out


def test_shrink_for_init_image_layout():
    """Trainer inits params on a (1, <=64px) slice — the bs16@1024 recipe
    OOMed the chip inside model.init before the fix. The slice must keep
    the GT-mask stride relation exact, including bit-packed masks."""
    from mp_former_tpu.engine.train_step import Batch
    from mp_former_tpu.engine.trainer import _shrink_for_init

    rng = np.random.RandomState(3)
    b, n, h, w, stride = 4, 7, 256, 256, 4
    masks = rng.rand(b, n, h // stride, w // stride) > 0.5
    tg = Targets(labels=jnp.zeros((b, n), jnp.int32),
                 masks=jnp.asarray(pack_bool_masks(masks)),
                 boxes=jnp.zeros((b, n, 4), jnp.float32),
                 valid=jnp.ones((b, n), bool))
    batch = Batch(images=np.zeros((b, h, w, 3), np.uint8), targets=tg)
    out = _shrink_for_init(batch)
    assert out.images.shape == (1, 64, 64, 3)
    assert out.targets.masks.shape == (1, n, 16, 2)  # 16px packed to 2 B
    assert out.targets.labels.shape == (1, n)
    got = np.asarray(unpack_batch_masks(out).targets.masks)
    assert (got == masks[:1, :, :16, :16]).all()


def test_shrink_for_init_video_layout_and_fallback():
    from mp_former_tpu.engine.trainer import _shrink_for_init
    from mp_former_tpu.video.video_maskformer import VideoTargets
    from mp_former_tpu.engine.train_step import Batch

    b, n, t, h, w = 2, 5, 3, 128, 128
    tg = VideoTargets(labels=jnp.zeros((b, n), jnp.int32),
                      masks=jnp.zeros((b, n, t, h, w), bool),
                      valid=jnp.ones((b, n), bool))
    batch = Batch(images=np.zeros((b, t, h, w, 3), np.uint8), targets=tg)
    out = _shrink_for_init(batch)
    assert out.images.shape == (1, t, 64, 64, 3)
    assert out.targets.masks.shape == (1, n, t, 64, 64)

    # ragged mask/image ratio -> batch-only slicing, shapes kept
    tg2 = Targets(labels=jnp.zeros((b, n), jnp.int32),
                  masks=jnp.zeros((b, n, 100, 100), bool),  # 128 % 100 != 0
                  boxes=jnp.zeros((b, n, 4), jnp.float32),
                  valid=jnp.ones((b, n), bool))
    batch2 = Batch(images=np.zeros((b, h, w, 3), np.uint8), targets=tg2)
    out2 = _shrink_for_init(batch2)
    assert out2.images.shape == (1, h, w, 3)
    assert out2.targets.masks.shape == (1, n, 100, 100)


# The uint8-image == float32-image forward-exactness test lives in
# tests/test_maskformer_forward.py (test_uint8_images_match_float32),
# reusing its small_model fixture.
