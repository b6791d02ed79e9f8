"""Checkpoint conversion: synthesize a state dict with the reference's exact
torch key layout (d2 MaskFormer R50 + MSDeformAttn pixel decoder + MaskDN
predictor), convert, and verify it loads into our model tree with matching
shapes — catches missing/renamed/transposed mappings."""

import numpy as np
import pytest

import jax

from mp_former_tpu.config import get_cfg, add_deeplab_config, add_maskformer2_config
from mp_former_tpu.engine.checkpoint_import import (
    convert_maskformer_state_dict, load_state_dict, _tree_shapes)
from mp_former_tpu.models import build_model


def _synthetic_reference_state_dict(num_classes=80, hidden=256, queries=100,
                                    dec_layers=9, enc_layers=6):
    """Key names exactly as in the released model_final.pth (d2 module paths,
    reference maskformer_model.py / msdeformattn.py / mask2former_transformer_decoder.py)."""
    rng = np.random.RandomState(0)
    sd = {}

    def t(*shape):
        return rng.randn(*shape).astype(np.float32)

    # --- backbone: d2 ResNet-50 ---
    sd["backbone.stem.conv1.weight"] = t(64, 3, 7, 7)
    for stat in ("weight", "bias", "running_mean", "running_var"):
        sd[f"backbone.stem.conv1.norm.{stat}"] = t(64)
    blocks = {"res2": (3, 64, 256), "res3": (4, 128, 512),
              "res4": (6, 256, 1024), "res5": (3, 512, 2048)}
    in_ch = 64
    for stage, (n, mid, out) in blocks.items():
        for j in range(n):
            pre = f"backbone.{stage}.{j}"
            cin = in_ch if j == 0 else out
            sd[f"{pre}.conv1.weight"] = t(mid, cin, 1, 1)
            sd[f"{pre}.conv2.weight"] = t(mid, mid, 3, 3)
            sd[f"{pre}.conv3.weight"] = t(out, mid, 1, 1)
            for c in ("conv1", "conv2", "conv3"):
                for stat in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{pre}.{c}.norm.{stat}"] = t(mid if c != "conv3" else out)
            if j == 0:
                sd[f"{pre}.shortcut.weight"] = t(out, cin, 1, 1)
                for stat in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{pre}.shortcut.norm.{stat}"] = t(out)
        in_ch = out

    # --- pixel decoder ---
    pd = "sem_seg_head.pixel_decoder"
    for i, cin in enumerate([2048, 1024, 512]):  # res5 -> res3
        sd[f"{pd}.input_proj.{i}.0.weight"] = t(hidden, cin, 1, 1)
        sd[f"{pd}.input_proj.{i}.0.bias"] = t(hidden)
        sd[f"{pd}.input_proj.{i}.1.weight"] = t(hidden)
        sd[f"{pd}.input_proj.{i}.1.bias"] = t(hidden)
    sd[f"{pd}.transformer.level_embed"] = t(3, hidden)
    for j in range(enc_layers):
        e = f"{pd}.transformer.encoder.layers.{j}"
        sd[f"{e}.self_attn.sampling_offsets.weight"] = t(8 * 3 * 4 * 2, hidden)
        sd[f"{e}.self_attn.sampling_offsets.bias"] = t(8 * 3 * 4 * 2)
        sd[f"{e}.self_attn.attention_weights.weight"] = t(8 * 3 * 4, hidden)
        sd[f"{e}.self_attn.attention_weights.bias"] = t(8 * 3 * 4)
        for nm in ("value_proj", "output_proj"):
            sd[f"{e}.self_attn.{nm}.weight"] = t(hidden, hidden)
            sd[f"{e}.self_attn.{nm}.bias"] = t(hidden)
        sd[f"{e}.norm1.weight"] = t(hidden)
        sd[f"{e}.norm1.bias"] = t(hidden)
        sd[f"{e}.linear1.weight"] = t(1024, hidden)
        sd[f"{e}.linear1.bias"] = t(1024)
        sd[f"{e}.linear2.weight"] = t(hidden, 1024)
        sd[f"{e}.linear2.bias"] = t(hidden)
        sd[f"{e}.norm2.weight"] = t(hidden)
        sd[f"{e}.norm2.bias"] = t(hidden)
    sd[f"{pd}.mask_features.weight"] = t(hidden, hidden, 1, 1)
    sd[f"{pd}.mask_features.bias"] = t(hidden)
    sd[f"{pd}.adapter_1.weight"] = t(hidden, 256, 1, 1)
    sd[f"{pd}.adapter_1.norm.weight"] = t(hidden)
    sd[f"{pd}.adapter_1.norm.bias"] = t(hidden)
    sd[f"{pd}.layer_1.weight"] = t(hidden, hidden, 3, 3)
    sd[f"{pd}.layer_1.norm.weight"] = t(hidden)
    sd[f"{pd}.layer_1.norm.bias"] = t(hidden)

    # --- predictor (MaskDN decoder) ---
    pr = "sem_seg_head.predictor"
    # use the v1 name 'static_query' to exercise the rename shim (:214-235)
    sd[f"{pr}.static_query.weight"] = t(queries, hidden)
    sd[f"{pr}.level_embed.weight"] = t(3, hidden)
    sd[f"{pr}.label_enc.weight"] = t(num_classes, hidden)
    sd[f"{pr}.decoder_norm.weight"] = t(hidden)
    sd[f"{pr}.decoder_norm.bias"] = t(hidden)
    sd[f"{pr}.class_embed.weight"] = t(num_classes + 1, hidden)
    sd[f"{pr}.class_embed.bias"] = t(num_classes + 1)
    for i in range(3):
        sd[f"{pr}.mask_embed.layers.{i}.weight"] = t(hidden, hidden)
        sd[f"{pr}.mask_embed.layers.{i}.bias"] = t(hidden)
    for i in range(dec_layers):
        sa = f"{pr}.transformer_self_attention_layers.{i}"
        sd[f"{sa}.self_attn.in_proj_weight"] = t(3 * hidden, hidden)
        sd[f"{sa}.self_attn.in_proj_bias"] = t(3 * hidden)
        sd[f"{sa}.self_attn.out_proj.weight"] = t(hidden, hidden)
        sd[f"{sa}.self_attn.out_proj.bias"] = t(hidden)
        sd[f"{sa}.norm.weight"] = t(hidden)
        sd[f"{sa}.norm.bias"] = t(hidden)
        ca = f"{pr}.transformer_cross_attention_layers.{i}"
        sd[f"{ca}.multihead_attn.in_proj_weight"] = t(3 * hidden, hidden)
        sd[f"{ca}.multihead_attn.in_proj_bias"] = t(3 * hidden)
        sd[f"{ca}.multihead_attn.out_proj.weight"] = t(hidden, hidden)
        sd[f"{ca}.multihead_attn.out_proj.bias"] = t(hidden)
        sd[f"{ca}.norm.weight"] = t(hidden)
        sd[f"{ca}.norm.bias"] = t(hidden)
        ff = f"{pr}.transformer_ffn_layers.{i}"
        sd[f"{ff}.linear1.weight"] = t(2048, hidden)
        sd[f"{ff}.linear1.bias"] = t(2048)
        sd[f"{ff}.linear2.weight"] = t(hidden, 2048)
        sd[f"{ff}.linear2.bias"] = t(hidden)
        sd[f"{ff}.norm.weight"] = t(hidden)
        sd[f"{ff}.norm.bias"] = t(hidden)
    return sd


def test_released_layout_converts_and_loads():
    import jax.numpy as jnp

    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    cfg.merge_from_file(
        "configs/coco/instance-segmentation/maskformer2_R50_bs16_12ep_DN_query.yaml")
    cfg.merge_from_list([
        "MODEL.MASK_FORMER.TRANSFORMER_DECODER_NAME",
        "MultiScaleMaskedTransformerDecoderMaskDN",
        "MODEL.MASK_FORMER.DN_MODE", "points",
    ])
    model = build_model(cfg)
    params = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3)), None, train=False))

    sd = _synthetic_reference_state_dict()
    converted = convert_maskformer_state_dict(sd)

    want = _tree_shapes(params["params"])
    got = _tree_shapes(converted)
    assert sorted(want) == sorted(got), (
        f"missing={sorted(set(want)-set(got))[:8]} "
        f"unexpected={sorted(set(got)-set(want))[:8]}")
    mismatched = [k for k in want if want[k] != got[k]]
    assert not mismatched, mismatched[:8]


def test_value_mapping_transposes():
    sd = _synthetic_reference_state_dict()
    converted = convert_maskformer_state_dict(sd)
    # conv OIHW -> HWIO
    np.testing.assert_allclose(
        converted["backbone"]["stem_conv1"]["kernel"],
        np.transpose(sd["backbone.stem.conv1.weight"], (2, 3, 1, 0)))
    # linear transpose
    np.testing.assert_allclose(
        converted["sem_seg_head"]["predictor"]["class_embed"]["kernel"],
        sd["sem_seg_head.predictor.class_embed.weight"].T)
    # packed MHA split: q block
    w = sd["sem_seg_head.predictor.transformer_self_attention_layers.0.self_attn.in_proj_weight"]
    np.testing.assert_allclose(
        converted["sem_seg_head"]["predictor"]
        ["transformer_self_attention_layers_0"]["self_attn"]["q_proj"]["kernel"],
        w[:256].T)
    # static_query shim
    assert "query_feat" in converted["sem_seg_head"]["predictor"]


def test_load_state_dict_bf16_tensors(tmp_path):
    """torch raises TypeError (not AttributeError) for bfloat16 .numpy();
    the loader must convert via float() instead of crashing."""
    import torch

    from mp_former_tpu.engine.checkpoint_import import load_state_dict

    sd = {"w": torch.ones(3, 4, dtype=torch.bfloat16),
          "b": torch.zeros(4)}
    p = str(tmp_path / "bf16.pth")
    torch.save(sd, p)
    out = load_state_dict(p)
    assert out["w"].shape == (3, 4)
    np.testing.assert_allclose(out["w"], 1.0)


def test_load_reference_weights_bogus_directory(tmp_path):
    """A directory that is not an Orbax checkpoint raises by default (eval
    paths must not silently report fresh-init metrics); the Trainer's
    allow_fresh_init=True keeps the warn-and-train-from-scratch fallback."""
    import pytest
    import jax.numpy as jnp

    from mp_former_tpu.engine.checkpoint_import import load_reference_weights

    template = {"w": jnp.ones((2,))}
    with pytest.raises(FileNotFoundError):
        load_reference_weights(str(tmp_path), template)
    out = load_reference_weights(str(tmp_path), template,
                                 allow_fresh_init=True)
    np.testing.assert_allclose(np.asarray(out["w"]), 1.0)


def test_load_reference_weights_missing_path_raises(tmp_path):
    import pytest

    import jax.numpy as jnp

    from mp_former_tpu.engine.checkpoint_import import load_reference_weights

    template = {"w": jnp.ones((2,))}
    with pytest.raises(FileNotFoundError):
        load_reference_weights(str(tmp_path / "nope.pth"), template)
