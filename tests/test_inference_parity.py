"""Inference post-processor parity vs the reference's torch logic
(maskformer_model.py:301-401)."""

import numpy as np
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from mp_former_tpu.inference import (instance_inference, panoptic_inference,
                                     semantic_inference)

RNG = np.random.RandomState(0)


def test_semantic_inference_matches_torch():
    q, k, h, w = 10, 5, 16, 16
    cls = RNG.randn(q, k + 1).astype(np.float32)
    masks = RNG.randn(q, h, w).astype(np.float32)
    tc, tm = torch.from_numpy(cls), torch.from_numpy(masks)
    want = torch.einsum(
        "qc,qhw->chw", TF.softmax(tc, -1)[..., :-1], tm.sigmoid()).numpy()
    got = np.asarray(semantic_inference(jnp.asarray(cls), jnp.asarray(masks)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_instance_inference_matches_torch():
    q, k, h, w, topk = 12, 6, 20, 20, 8
    cls = RNG.randn(q, k + 1).astype(np.float32)
    masks = RNG.randn(q, h, w).astype(np.float32)

    # torch oracle (reference instance_inference :365-401)
    tc, tm = torch.from_numpy(cls), torch.from_numpy(masks)
    scores = TF.softmax(tc, -1)[:, :-1]
    labels = torch.arange(k).unsqueeze(0).repeat(q, 1).flatten(0, 1)
    s_img, idx = scores.flatten(0, 1).topk(topk, sorted=False)
    lbl = labels[idx]
    qidx = idx // k
    mp = tm[qidx]
    binary = (mp > 0).float()
    msc = (mp.sigmoid().flatten(1) * binary.flatten(1)).sum(1) / (
        binary.flatten(1).sum(1) + 1e-6)
    want_scores = (s_img * msc).numpy()
    want_labels = lbl.numpy()
    want_masks = binary.numpy().astype(bool)

    out = instance_inference(jnp.asarray(cls), jnp.asarray(masks), k, topk)
    got_scores = np.asarray(out.scores)
    got_labels = np.asarray(out.pred_classes)
    got_masks = np.asarray(out.pred_masks)

    # topk(sorted=False) order may differ; compare as sets keyed by (label, score)
    o1 = np.argsort(want_scores)
    o2 = np.argsort(got_scores)
    np.testing.assert_allclose(got_scores[o2], want_scores[o1], rtol=1e-5)
    np.testing.assert_array_equal(got_labels[o2], want_labels[o1])
    np.testing.assert_array_equal(got_masks[o2], want_masks[o1])


def test_panoptic_inference_matches_torch_loop():
    q, k, h, w = 8, 4, 24, 24
    cls = RNG.randn(q, k + 1).astype(np.float32) * 3
    masks = RNG.randn(q, h, w).astype(np.float32) * 2
    obj_thr, ovl_thr = 0.5, 0.6
    is_thing = np.array([True, True, False, False])

    # torch oracle (reference panoptic_inference :307-363)
    tc, tm = torch.from_numpy(cls), torch.from_numpy(masks)
    scores, labels = TF.softmax(tc, -1).max(-1)
    mp = tm.sigmoid()
    keep = labels.ne(k) & (scores > obj_thr)
    cur_scores, cur_classes, cur_masks = scores[keep], labels[keep], mp[keep]
    pan = np.zeros((h, w), np.int32)
    segs = []
    if cur_masks.shape[0] > 0:
        prob = cur_scores.view(-1, 1, 1) * cur_masks
        ids = prob.argmax(0)
        stuff = {}
        cur = 0
        for j in range(cur_classes.shape[0]):
            pc = int(cur_classes[j])
            isth = bool(is_thing[pc])
            mask_area = int((ids == j).sum())
            orig = int((cur_masks[j] >= 0.5).sum())
            mask = ((ids == j) & (cur_masks[j] >= 0.5)).numpy()
            if mask_area > 0 and orig > 0 and mask.sum() > 0:
                if mask_area / orig < ovl_thr:
                    continue
                if not isth:
                    if pc in stuff:
                        pan[mask] = stuff[pc]
                        continue
                    stuff[pc] = cur + 1
                cur += 1
                pan[mask] = cur
                segs.append({"id": cur, "isthing": isth, "category_id": pc})

    got_pan, got_segs = panoptic_inference(
        jnp.asarray(cls), jnp.asarray(masks), k, obj_thr, ovl_thr, is_thing)
    np.testing.assert_array_equal(got_pan, pan)
    assert got_segs == segs
