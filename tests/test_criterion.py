"""Matcher/criterion parity vs torch oracles + static-shape masking checks."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from mp_former_tpu.models.matcher import (
    HungarianMatcher, batch_dice_cost, batch_sigmoid_ce_cost, hungarian_assign)
from mp_former_tpu.models.criterion import (
    SetCriterion, sample_mask_points, dice_loss, sigmoid_ce_loss)
from mp_former_tpu.structures import Targets

RNG = np.random.RandomState(0)


def test_batch_cost_functions_match_torch():
    q, n, p = 7, 5, 64
    inputs = RNG.randn(q, p).astype(np.float32)
    targets = (RNG.rand(n, p) > 0.5).astype(np.float32)

    ti, tt = torch.from_numpy(inputs), torch.from_numpy(targets)
    # reference batch_dice_loss (matcher.py:17-31)
    si = ti.sigmoid()
    num = 2 * torch.einsum("nc,mc->nm", si, tt)
    den = si.sum(-1)[:, None] + tt.sum(-1)[None, :]
    want_dice = (1 - (num + 1) / (den + 1)).numpy()
    # reference batch_sigmoid_ce_loss (matcher.py:39-62)
    pos = F.binary_cross_entropy_with_logits(ti, torch.ones_like(ti), reduction="none")
    neg = F.binary_cross_entropy_with_logits(ti, torch.zeros_like(ti), reduction="none")
    want_ce = ((torch.einsum("nc,mc->nm", pos, tt)
                + torch.einsum("nc,mc->nm", neg, 1 - tt)) / p).numpy()

    np.testing.assert_allclose(np.asarray(batch_dice_cost(jnp.asarray(inputs), jnp.asarray(targets))),
                               want_dice, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(batch_sigmoid_ce_cost(jnp.asarray(inputs), jnp.asarray(targets))),
                               want_ce, rtol=1e-5, atol=1e-5)


def test_hungarian_assign_optimal_and_batched():
    import scipy.optimize
    cost = RNG.rand(3, 2, 10, 6).astype(np.float32)
    got = np.asarray(hungarian_assign(jnp.asarray(cost)))
    assert got.shape == (3, 2, 6)
    for i in range(3):
        for b in range(2):
            r, c = scipy.optimize.linear_sum_assignment(cost[i, b])
            want = np.zeros(6, np.int32)
            want[c] = r
            np.testing.assert_array_equal(got[i, b], want)


def test_sample_mask_points_matches_grid_sample_with_gather():
    b, m, n, h, w, p = 2, 9, 4, 16, 24, 33
    masks = RNG.randn(b, m, h, w).astype(np.float32)
    qidx = RNG.randint(0, m, (b, n)).astype(np.int32)
    coords = RNG.rand(b, n, p, 2).astype(np.float32)

    # torch oracle: gather per pair then point_sample (criterion.py:153-187 path)
    tm = torch.from_numpy(masks)
    gathered = tm[torch.arange(b)[:, None], torch.from_numpy(qidx)]  # (b, n, h, w)
    grid = 2.0 * torch.from_numpy(coords) - 1.0  # (b, n, p, 2)
    want = F.grid_sample(
        gathered.reshape(b * n, 1, h, w), grid.reshape(b * n, 1, p, 2),
        mode="bilinear", padding_mode="zeros", align_corners=False,
    ).reshape(b, n, p).numpy()

    got = np.asarray(sample_mask_points(
        jnp.asarray(masks), jnp.asarray(qidx), jnp.asarray(coords)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_point_losses_match_torch():
    b, n, p = 2, 5, 50
    logits = RNG.randn(b, n, p).astype(np.float32)
    labels = (RNG.rand(b, n, p) > 0.5).astype(np.float32)
    valid = np.ones((b, n), bool)
    num_masks = float(b * n)

    tl, tt = torch.from_numpy(logits.reshape(-1, p)), torch.from_numpy(labels.reshape(-1, p))
    want_ce = F.binary_cross_entropy_with_logits(tl, tt, reduction="none").mean(1).sum() / num_masks
    si = tl.sigmoid()
    want_dice = (1 - (2 * (si * tt).sum(-1) + 1) / (si.sum(-1) + tt.sum(-1) + 1)).sum() / num_masks

    got_ce = sigmoid_ce_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(valid), num_masks)
    got_dice = dice_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(valid), num_masks)
    np.testing.assert_allclose(float(got_ce), float(want_ce), rtol=1e-5)
    np.testing.assert_allclose(float(got_dice), float(want_dice), rtol=1e-5)


def test_loss_labels_matches_torch_weighted_ce():
    b, q, n, k = 2, 10, 4, 6
    logits = RNG.randn(b, q, k + 1).astype(np.float32)
    labels = RNG.randint(0, k, (b, n)).astype(np.int32)
    valid = np.array([[True, True, False, False], [True, True, True, False]])
    qidx = np.stack([np.random.RandomState(i).permutation(q)[:n] for i in range(b)]).astype(np.int32)

    crit = SetCriterion(k, None, {}, eos_coef=0.1, losses=["labels"],
                        num_points=16, oversample_ratio=3.0, importance_sample_ratio=0.75)
    got = crit.loss_labels(jnp.asarray(logits), jnp.asarray(qidx),
                           jnp.asarray(labels), jnp.asarray(valid))["loss_ce"]

    # torch oracle (criterion.py:127-144)
    target = np.full((b, q), k, np.int64)
    for i in range(b):
        for j in range(n):
            if valid[i, j]:
                target[i, qidx[i, j]] = labels[i, j]
    weight = torch.ones(k + 1)
    weight[-1] = 0.1
    want = F.cross_entropy(torch.from_numpy(logits).transpose(1, 2),
                           torch.from_numpy(target), weight)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def _dummy_outputs(b, q, k, h, w, layers, rng, dn_pad=0):
    def mk():
        return {
            "pred_logits": jnp.asarray(rng.randn(b, q, k + 1), jnp.float32),
            "pred_masks": jnp.asarray(rng.randn(b, q, h, w), jnp.float32),
        }
    out = mk()
    out["aux_outputs"] = [mk() for _ in range(layers - 1)]
    if dn_pad:
        def mkdn():
            return {
                "pred_logits": jnp.asarray(rng.randn(b, dn_pad, k + 1), jnp.float32),
                "pred_masks": jnp.asarray(rng.randn(b, dn_pad, h, w), jnp.float32),
            }
        dn = mkdn()
        dn["aux_outputs"] = [mkdn() for _ in range(layers - 1)]
        dn["dn_args"] = {"pad_size": dn_pad, "max_num": dn_pad, "scalar": 1}
        out["dn_out"] = dn
    else:
        out["dn_out"] = None
    return out


def test_full_criterion_keys_and_finiteness():
    b, q, n, k, h, w, layers = 2, 10, 5, 6, 16, 16, 3
    rng = np.random.RandomState(3)
    matcher = HungarianMatcher(2.0, 5.0, 5.0, num_points=64)
    crit = SetCriterion(k, matcher, {}, 0.1, ["labels", "masks"],
                        num_points=64, oversample_ratio=3.0,
                        importance_sample_ratio=0.75)
    masks = rng.rand(b, n, 64, 64) > 0.6
    targets = Targets(
        labels=jnp.asarray(rng.randint(0, k, (b, n)), jnp.int32),
        masks=jnp.asarray(masks),
        boxes=jnp.asarray(rng.rand(b, n, 4), jnp.float32),
        valid=jnp.asarray([[1, 1, 1, 0, 0], [1, 0, 0, 0, 0]], bool),
    )
    outputs = _dummy_outputs(b, q, k, h, w, layers, rng, dn_pad=n)
    losses = crit(outputs, targets, jax.random.PRNGKey(0))

    for base in ("loss_ce", "loss_mask", "loss_dice",
                 "loss_ce_dn", "loss_mask_dn", "loss_dice_dn"):
        assert base in losses
        for i in range(layers - 1):
            assert f"{base}_{i}" in losses
    for k_, v in losses.items():
        assert np.isfinite(float(v)), k_


def test_dn_grid_ctx_uses_capped_gt_rows():
    """With scalar>1 and a compacted DN block (max_num < MAX_INSTANCES), the
    grid-mode DN losses must read GT rows modulo the CAPPED width. Invariance
    check: padding targets with extra invalid rows must not change DN losses
    (the bug read group>=1 slots from the padding rows of the uncapped set)."""
    b, q, k, h, w, layers = 1, 8, 4, 8, 8, 2
    n_cap, scalar = 2, 2
    rng = np.random.RandomState(7)
    matcher = HungarianMatcher(2.0, 5.0, 5.0, num_points=32)
    crit = SetCriterion(k, matcher, {}, 0.1, ["labels", "masks"],
                        num_points=32, oversample_ratio=2.0,
                        importance_sample_ratio=0.75,
                        max_pairs=64, point_sample_mode="grid")

    gt_masks = rng.rand(b, n_cap, 32, 32) > 0.4
    labels = rng.randint(0, k, (b, n_cap))

    def targets_padded_to(width):
        pad = width - n_cap
        return Targets(
            labels=jnp.asarray(np.pad(labels, ((0, 0), (0, pad))), jnp.int32),
            masks=jnp.asarray(np.pad(gt_masks, ((0, 0), (0, pad), (0, 0), (0, 0)))),
            boxes=jnp.asarray(np.pad(rng.rand(b, n_cap, 4),
                                     ((0, 0), (0, pad), (0, 0))), jnp.float32),
            valid=jnp.asarray(np.pad(np.ones((b, n_cap), bool),
                                     ((0, 0), (0, pad)))))

    pad_size = scalar * n_cap
    outputs = _dummy_outputs(b, q, k, h, w, layers, rng, dn_pad=pad_size)
    outputs["dn_out"]["dn_args"] = {
        "pad_size": pad_size, "max_num": n_cap, "scalar": scalar}

    l_wide = crit(outputs, targets_padded_to(6), jax.random.PRNGKey(0))
    l_tight = crit(outputs, targets_padded_to(n_cap), jax.random.PRNGKey(0))
    for key in ("loss_mask_dn", "loss_dice_dn", "loss_ce_dn"):
        np.testing.assert_allclose(
            float(l_wide[key]), float(l_tight[key]), rtol=1e-5, err_msg=key)
        assert float(l_tight[key]) != 0.0


def test_criterion_zero_dn_when_absent():
    b, q, n, k, h, w, layers = 1, 8, 3, 4, 8, 8, 2
    rng = np.random.RandomState(4)
    matcher = HungarianMatcher(2.0, 5.0, 5.0, num_points=32)
    crit = SetCriterion(k, matcher, {}, 0.1, ["labels", "masks"],
                        num_points=32, oversample_ratio=2.0,
                        importance_sample_ratio=0.75)
    targets = Targets(
        labels=jnp.asarray(rng.randint(0, k, (b, n)), jnp.int32),
        masks=jnp.asarray(rng.rand(b, n, 32, 32) > 0.5),
        boxes=jnp.asarray(rng.rand(b, n, 4), jnp.float32),
        valid=jnp.ones((b, n), bool),
    )
    outputs = _dummy_outputs(b, q, k, h, w, layers, rng, dn_pad=0)
    losses = crit(outputs, targets, jax.random.PRNGKey(1))
    assert float(losses["loss_ce_dn"]) == 0.0
    assert float(losses["loss_mask_dn_0"]) == 0.0


def test_sample_mask_points_packed_equals_taps():
    """The packed 2x2-patch single-gather formulation must be numerically
    identical (values AND grads) to the 4-separate-taps form it replaced
    (reference point_rend point_sample semantics)."""
    import jax
    import jax.numpy as jnp

    from mp_former_tpu.models.criterion import (_sample_mask_points_taps,
                                                sample_mask_points)

    r = np.random.RandomState(0)
    masks = jnp.asarray(r.rand(2, 5, 17, 23).astype(np.float32))
    qidx = jnp.asarray(r.randint(0, 5, (2, 4)), jnp.int32)
    coords = jnp.asarray(r.rand(2, 4, 50, 2).astype(np.float32))
    coords = coords.at[0, 0, :5, 0].set(
        jnp.asarray([0.0, 1.0, 0.999, 0.001, 0.5]))

    a = sample_mask_points(masks, qidx, coords)
    b = _sample_mask_points_taps(masks, qidx, coords)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)
    c5 = jnp.asarray(r.rand(2, 5, 50, 2).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(sample_mask_points(masks, None, c5)),
        np.asarray(_sample_mask_points_taps(masks, None, c5)),
        rtol=1e-6, atol=1e-6)
    g1 = jax.grad(lambda m: sample_mask_points(m, qidx, coords).sum())(masks)
    g2 = jax.grad(
        lambda m: _sample_mask_points_taps(m, qidx, coords).sum())(masks)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)


def test_sample_points_matmul_equals_gather():
    """The tent-matrix matmul sampler (MXU; no scatter in the backward) must
    match the gather-based point_sample to fp32 accumulation tolerance,
    chunked and unchunked, values and grads."""
    import jax
    import jax.numpy as jnp

    from mp_former_tpu.models.criterion import (sample_mask_points,
                                                sample_points_matmul)

    r = np.random.RandomState(0)
    masks = jnp.asarray(r.randn(7, 19, 23).astype(np.float32))
    coords = jnp.asarray(r.rand(7, 40, 2).astype(np.float32))
    coords = coords.at[0, :4, 0].set(jnp.asarray([0.0, 1.0, 0.5, 0.013]))
    ref = sample_mask_points(masks[None].reshape(1, 7, 19, 23), None,
                             coords[None])[0]
    for chunk in (0, 3):
        got = sample_points_matmul(masks, coords, pair_chunk=chunk)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)
    g1 = jax.grad(
        lambda m: (sample_points_matmul(m, coords, pair_chunk=3) ** 2).sum()
    )(masks)
    g2 = jax.grad(
        lambda m: (sample_mask_points(
            m[None].reshape(1, 7, 19, 23), None, coords[None])[0] ** 2).sum()
    )(masks[None].reshape(1, 7, 19, 23))[0].reshape(7, 19, 23)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)

    # bf16 mode (the uncertainty-SELECTION pass): values within bf16
    # tolerance of exact — good enough to rank |logit| uncertainties
    got16 = sample_points_matmul(masks, coords, pair_chunk=3,
                                 dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got16), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_loss_masks_stacked_matches_dense_oracle():
    """Independent check of the stacked loss's per-layer indexing, pair
    compaction, shared GT table, and reductions. With oversample_ratio=1
    and importance_sample_ratio=1 the uncertainty top-k selects ALL sampled
    points (a permutation), and CE-mean/dice are permutation-invariant —
    so the loss is fully determined by the coords1 draw, which the test
    reproduces to compute each layer's losses densely from first
    principles."""
    import jax
    import jax.numpy as jnp

    from mp_former_tpu.models.criterion import (SetCriterion,
                                                sample_mask_points)
    from mp_former_tpu.models.matcher import HungarianMatcher

    num_points, p = 16, 6
    crit = SetCriterion(
        num_classes=3, matcher=HungarianMatcher(1, 1, 1, 32),
        weight_dict={}, eos_coef=0.1, losses=["masks"],
        num_points=num_points,
        oversample_ratio=1.0, importance_sample_ratio=1.0, max_pairs=p)
    r = np.random.RandomState(1)
    l, b, q, n, h, w = 3, 2, 5, 4, 16, 16
    pred = jnp.asarray(r.randn(l, b, q, h, w).astype(np.float32))
    qidx = jnp.asarray(r.randint(0, q, (l, b, n)), jnp.int32)
    gt = jnp.asarray(r.rand(b, n, 32, 32) > 0.5, jnp.float32)
    valid = jnp.asarray([[True, True, False, False], [True] * 4])
    num_masks = 6.0
    rng = jax.random.PRNGKey(0)

    out = crit.loss_masks_stacked(pred, qidx, gt, valid, num_masks, rng)
    assert out["loss_mask"].shape == (l,) and out["loss_dice"].shape == (l,)

    # --- dense oracle -------------------------------------------------
    k1, _ = jax.random.split(rng)          # same key path as the impl
    coords1 = jax.random.uniform(k1, (l, p, num_points, 2))
    flat_valid = np.asarray(valid).reshape(-1)
    order = np.argsort(~flat_valid, kind="stable")
    sel = order[:p]
    sel_b, sel_n = sel // n, sel % n
    for li in range(l):
        ce_sum, dice_sum = 0.0, 0.0
        for s in range(p):
            if not flat_valid[sel[s]]:
                continue
            qi = int(np.asarray(qidx)[li, sel_b[s], sel_n[s]])
            logits = sample_mask_points(
                pred[li, sel_b[s], qi][None, None], None,
                coords1[li, s][None, None])[0, 0]
            labels = sample_mask_points(
                gt[sel_b[s], sel_n[s]][None, None], None,
                coords1[li, s][None, None])[0, 0]
            lg, lb = np.asarray(logits, np.float64), np.asarray(labels, np.float64)
            ce = np.maximum(lg, 0) - lg * lb + np.log1p(np.exp(-np.abs(lg)))
            ce_sum += ce.mean()
            sig = 1 / (1 + np.exp(-lg))
            dice_sum += 1 - (2 * (sig * lb).sum() + 1) / (sig.sum() + lb.sum() + 1)
        np.testing.assert_allclose(
            float(out["loss_mask"][li]), ce_sum / num_masks,
            rtol=1e-4, atol=1e-5, err_msg=f"loss_mask layer {li}")
        np.testing.assert_allclose(
            float(out["loss_dice"][li]), dice_sum / num_masks,
            rtol=1e-4, atol=1e-5, err_msg=f"loss_dice layer {li}")
