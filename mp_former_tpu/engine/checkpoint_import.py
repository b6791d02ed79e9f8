"""Full-model torch checkpoint -> flax params converter.

Handles the released MP-Former `model_final.pth` layout (d2 MaskFormer:
backbone.* / sem_seg_head.pixel_decoder.* / sem_seg_head.predictor.*),
including the reference's own migration shims (`static_query` ->
`query_feat`, mask2former_transformer_decoder.py:214-235; head prefix
rewrites, mask_former_head.py:23-45) and torch nn.MultiheadAttention packed
in_proj splitting.
"""

from __future__ import annotations

import pickle
import re
from typing import Any, Dict

import numpy as np

from .convert import (_bn, _conv, _linear, d2_resnet_params_from_state_dict,
                      swin_params_from_torch)


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth (via torch, cpu) or d2 .pkl into numpy arrays."""
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        sd = data.get("model", data)
        return {k: np.asarray(v) for k, v in sd.items() if not k.endswith("_momentum")}
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    sd = data.get("model", data) if isinstance(data, dict) else data
    out = {}
    for k, v in sd.items():
        try:
            out[k] = v.numpy()
        except AttributeError:
            out[k] = np.asarray(v)
        except TypeError:
            # torch raises TypeError for dtypes numpy lacks (bfloat16)
            out[k] = v.float().numpy()
    return out


def _apply_shims(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        nk = k.replace("static_query", "query_feat")  # reference :214-235
        # d2 head v1->v2 prefix shim (mask_former_head.py:23-45)
        nk = nk.replace("sem_seg_head.layer_4", "sem_seg_head.adapter_1")
        out[nk] = v
    return out


def _mha(sd, prefix) -> Dict[str, Any]:
    """torch nn.MultiheadAttention -> q/k/v/out Dense split."""
    w = sd[f"{prefix}.in_proj_weight"]
    b = sd[f"{prefix}.in_proj_bias"]
    c = w.shape[0] // 3
    return {
        "q_proj": {"kernel": w[:c].T, "bias": b[:c]},
        "k_proj": {"kernel": w[c:2 * c].T, "bias": b[c:2 * c]},
        "v_proj": {"kernel": w[2 * c:].T, "bias": b[2 * c:]},
        "out_proj": _linear(sd, f"{prefix}.out_proj"),
    }


def _ln(sd, prefix) -> Dict[str, np.ndarray]:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _conv(sd, key, bias=True):
    out = {"kernel": np.transpose(sd[f"{key}.weight"], (2, 3, 1, 0))}
    if bias and f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def convert_fpn_pixel_decoder(sd: Dict[str, np.ndarray],
                              prefix: str = "sem_seg_head.pixel_decoder."
                              ) -> Dict[str, Any]:
    """BasePixelDecoder / TransformerEncoderPixelDecoder (reference
    pixel_decoder/fpn.py:37-312): adapter_{k}/layer_{k} lateral+output convs
    (1-based, res2..res5 order), mask_features, and — for the transformer
    variant — input_proj + the vanilla 6-layer encoder
    (transformer.encoder.layers.{i} with packed in_proj MHA)."""
    p: Dict[str, Any] = {}
    k = 1
    while f"{prefix}layer_{k}.weight" in sd:
        if f"{prefix}adapter_{k}.weight" in sd:
            p[f"adapter_{k}"] = {
                "conv": _conv(sd, f"{prefix}adapter_{k}"),
                "gn": _ln(sd, f"{prefix}adapter_{k}.norm"),
            }
        p[f"layer_{k}"] = {
            "conv": _conv(sd, f"{prefix}layer_{k}"),
            "gn": _ln(sd, f"{prefix}layer_{k}.norm"),
        }
        k += 1
    p["mask_features"] = _conv(sd, f"{prefix}mask_features")
    if f"{prefix}input_proj.weight" in sd:
        p["input_proj"] = _conv(sd, f"{prefix}input_proj")
    i = 0
    while f"{prefix}transformer.encoder.layers.{i}.norm1.weight" in sd:
        t = f"{prefix}transformer.encoder.layers.{i}"
        p[f"transformer_layer_{i}"] = {
            "self_attn": _mha(sd, f"{t}.self_attn"),
            "norm1": _ln(sd, f"{t}.norm1"),
            "linear1": _linear(sd, f"{t}.linear1"),
            "linear2": _linear(sd, f"{t}.linear2"),
            "norm2": _ln(sd, f"{t}.norm2"),
        }
        i += 1
    return p


def convert_pixel_decoder(sd: Dict[str, np.ndarray],
                          prefix: str = "sem_seg_head.pixel_decoder.") -> Dict[str, Any]:
    if f"{prefix}transformer.level_embed" not in sd:
        return convert_fpn_pixel_decoder(sd, prefix)
    p: Dict[str, Any] = {}
    i = 0
    while f"{prefix}input_proj.{i}.0.weight" in sd:
        p[f"input_proj_{i}_conv"] = {
            "kernel": np.transpose(sd[f"{prefix}input_proj.{i}.0.weight"], (2, 3, 1, 0)),
            "bias": sd[f"{prefix}input_proj.{i}.0.bias"],
        }
        p[f"input_proj_{i}_gn"] = _ln(sd, f"{prefix}input_proj.{i}.1")
        i += 1
    tx: Dict[str, Any] = {"level_embed": sd[f"{prefix}transformer.level_embed"]}
    j = 0
    while f"{prefix}transformer.encoder.layers.{j}.norm1.weight" in sd:
        t = f"{prefix}transformer.encoder.layers.{j}"
        tx[f"encoder_layers_{j}"] = {
            "self_attn": {
                "sampling_offsets": _linear(sd, f"{t}.self_attn.sampling_offsets"),
                "attention_weights": _linear(sd, f"{t}.self_attn.attention_weights"),
                "value_proj": _linear(sd, f"{t}.self_attn.value_proj"),
                "output_proj": _linear(sd, f"{t}.self_attn.output_proj"),
            },
            "norm1": _ln(sd, f"{t}.norm1"),
            "linear1": _linear(sd, f"{t}.linear1"),
            "linear2": _linear(sd, f"{t}.linear2"),
            "norm2": _ln(sd, f"{t}.norm2"),
        }
        j += 1
    p["transformer"] = tx
    p["mask_features"] = {
        "kernel": np.transpose(sd[f"{prefix}mask_features.weight"], (2, 3, 1, 0)),
        "bias": sd[f"{prefix}mask_features.bias"],
    }
    k = 1
    while f"{prefix}adapter_{k}.weight" in sd:
        p[f"adapter_{k}_conv"] = {
            "kernel": np.transpose(sd[f"{prefix}adapter_{k}.weight"], (2, 3, 1, 0))}
        p[f"adapter_{k}_gn"] = _ln(sd, f"{prefix}adapter_{k}.norm")
        p[f"layer_{k}_conv"] = {
            "kernel": np.transpose(sd[f"{prefix}layer_{k}.weight"], (2, 3, 1, 0))}
        p[f"layer_{k}_gn"] = _ln(sd, f"{prefix}layer_{k}.norm")
        k += 1
    return p


def convert_standard_predictor(sd: Dict[str, np.ndarray],
                               prefix: str = "sem_seg_head.predictor."
                               ) -> Dict[str, Any]:
    """StandardTransformerDecoder (reference
    maskformer_transformer_decoder.py:30-171 + DETR transformer.py):
    query_embed, optional input_proj (only when in_channels != hidden_dim or
    ENFORCE_INPUT_PROJ), class_embed, 3-layer mask_embed MLP, decoder layers
    transformer.decoder.layers.{i} (packed-in_proj self/cross MHA + FFN +
    norm1-3), final transformer.decoder.norm, optional DETR encoder."""
    p: Dict[str, Any] = {
        "query_embed": sd[f"{prefix}query_embed.weight"],
        "decoder_norm": _ln(sd, f"{prefix}transformer.decoder.norm"),
        "class_embed": _linear(sd, f"{prefix}class_embed"),
        "mask_embed": {
            f"layers_{i}": _linear(sd, f"{prefix}mask_embed.layers.{i}")
            for i in range(3)
        },
    }
    if f"{prefix}input_proj.weight" in sd:
        p["input_proj"] = _conv(sd, f"{prefix}input_proj")
    i = 0
    while f"{prefix}transformer.decoder.layers.{i}.norm1.weight" in sd:
        t = f"{prefix}transformer.decoder.layers.{i}"
        p[f"decoder_layer_{i}"] = {
            "self_attn": _mha(sd, f"{t}.self_attn"),
            "multihead_attn": _mha(sd, f"{t}.multihead_attn"),
            "linear1": _linear(sd, f"{t}.linear1"),
            "linear2": _linear(sd, f"{t}.linear2"),
            "norm1": _ln(sd, f"{t}.norm1"),
            "norm2": _ln(sd, f"{t}.norm2"),
            "norm3": _ln(sd, f"{t}.norm3"),
        }
        i += 1
    i = 0
    while f"{prefix}transformer.encoder.layers.{i}.norm1.weight" in sd:
        t = f"{prefix}transformer.encoder.layers.{i}"
        p[f"encoder_layer_{i}"] = {
            "self_attn": _mha(sd, f"{t}.self_attn"),
            "norm1": _ln(sd, f"{t}.norm1"),
            "linear1": _linear(sd, f"{t}.linear1"),
            "linear2": _linear(sd, f"{t}.linear2"),
            "norm2": _ln(sd, f"{t}.norm2"),
        }
        i += 1
    return p


def convert_predictor(sd: Dict[str, np.ndarray],
                      prefix: str = "sem_seg_head.predictor.") -> Dict[str, Any]:
    if f"{prefix}transformer.decoder.norm.weight" in sd:
        return convert_standard_predictor(sd, prefix)
    p: Dict[str, Any] = {
        "query_feat": sd[f"{prefix}query_feat.weight"],
        "level_embed": sd[f"{prefix}level_embed.weight"],
        "decoder_norm": _ln(sd, f"{prefix}decoder_norm"),
        "class_embed": _linear(sd, f"{prefix}class_embed"),
        "mask_embed": {
            f"layers_{i}": _linear(sd, f"{prefix}mask_embed.layers.{i}")
            for i in range(3)
        },
    }
    if f"{prefix}label_enc.weight" in sd:
        p["label_enc"] = sd[f"{prefix}label_enc.weight"]
    if f"{prefix}query_embed.weight" in sd:
        # the video decoder KEEPS the learnable query positional embedding
        # (reference video_mask2former_transformer_decoder.py:323); image
        # MaskDN checkpoints have no such key
        p["query_embed"] = sd[f"{prefix}query_embed.weight"]
    i = 0
    while f"{prefix}transformer_self_attention_layers.{i}.norm.weight" in sd:
        p[f"transformer_self_attention_layers_{i}"] = {
            "self_attn": _mha(sd, f"{prefix}transformer_self_attention_layers.{i}.self_attn"),
            "norm": _ln(sd, f"{prefix}transformer_self_attention_layers.{i}.norm"),
        }
        p[f"transformer_cross_attention_layers_{i}"] = {
            "multihead_attn": _mha(
                sd, f"{prefix}transformer_cross_attention_layers.{i}.multihead_attn"),
            "norm": _ln(sd, f"{prefix}transformer_cross_attention_layers.{i}.norm"),
        }
        t = f"{prefix}transformer_ffn_layers.{i}"
        p[f"transformer_ffn_layers_{i}"] = {
            "linear1": _linear(sd, f"{t}.linear1"),
            "linear2": _linear(sd, f"{t}.linear2"),
            "norm": _ln(sd, f"{t}.norm"),
        }
        i += 1
    for ip in range(3):
        if f"{prefix}input_proj.{ip}.weight" in sd:
            p[f"input_proj_{ip}"] = {
                "kernel": np.transpose(sd[f"{prefix}input_proj.{ip}.weight"], (2, 3, 1, 0)),
                "bias": sd[f"{prefix}input_proj.{ip}.bias"],
            }
    return p


def convert_maskformer_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Full model: returns {'backbone': ..., 'sem_seg_head': {'pixel_decoder',
    'predictor'}} matching our MaskFormer module tree."""
    sd = _apply_shims(sd)
    if "backbone.stem.conv1.weight" in sd:
        backbone = d2_resnet_params_from_state_dict(sd, "backbone.")
    elif "backbone.patch_embed.proj.weight" in sd:
        backbone = swin_params_from_torch(sd, "backbone.")
    else:
        raise ValueError("Unrecognized backbone layout in state dict")
    out = {"backbone": backbone}
    if any(k.startswith("sem_seg_head.") for k in sd):
        out["sem_seg_head"] = {
            "pixel_decoder": convert_pixel_decoder(sd),
            "predictor": convert_predictor(sd),
        }
    return out


def _tree_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_shapes(v, prefix + k + "/"))
        else:
            out[prefix + k] = tuple(np.shape(v))
    return out


def resolve_checkpoint_path(path: str):
    """Resolve a cfg.MODEL.WEIGHTS string to a local file, or None.

    Handles the d2 zoo scheme (`detectron2://ImageNetPretrained/...`) used by
    the reference Base configs (e.g. Base-ADE20K-*.yaml:5) by searching the
    usual iopath cache locations and the working directory; plain paths pass
    through. Returns None when nothing exists locally (offline pods)."""
    import os

    if not path.startswith("detectron2://"):
        return path if os.path.exists(path) else None
    rel = path[len("detectron2://"):]
    cands = [
        os.path.join(os.environ.get("FVCORE_CACHE",
                                    os.path.expanduser("~/.torch/iopath_cache")),
                     "detectron2", rel),
        os.path.join("checkpoints", os.path.basename(rel)),
        os.path.basename(rel),
    ]
    for c in cands:
        if os.path.exists(c):
            return c
    return None


def _load_orbax_params(path: str):
    """Restore the 'params' tree from a Trainer Orbax checkpoint directory.
    Returns None if the directory is not an Orbax checkpoint."""
    import os

    import orbax.checkpoint as ocp

    candidates = [path]
    # checkpoints root: pick the max numeric step subdir
    steps = sorted((int(d) for d in os.listdir(path) if d.isdigit()),
                   reverse=True)
    candidates = [os.path.join(path, str(s)) for s in steps] + candidates
    for c in candidates:
        item = os.path.join(c, "default")
        target = item if os.path.isdir(item) else c
        if not os.path.isfile(os.path.join(target, "_METADATA")) and \
                not os.path.isdir(os.path.join(target, "params")):
            continue
        try:
            restored = ocp.StandardCheckpointer().restore(
                os.path.abspath(target))
        except Exception:
            continue
        if isinstance(restored, dict) and "params" in restored:
            return restored["params"]
        return restored
    return None


def load_reference_weights(path: str, params_template,
                           strict: bool = False,
                           allow_fresh_init: bool = False) -> Any:
    """Load + convert a reference checkpoint into the flax param template.

    d2 DetectionCheckpointer semantics (used at reference train_net.py:378):
    keys present in both and shape-compatible are loaded; missing/unexpected
    keys are logged, not fatal — this is what makes backbone-only ImageNet
    pkls (`detectron2://ImageNetPretrained/torchvision/R-50.pkl`) loadable
    into the full model. Pass strict=True to require an exact match.
    """
    import logging
    import os

    import jax

    logger = logging.getLogger(__name__)
    if os.path.isdir(path):
        # one of OUR Orbax checkpoints (Trainer.save writes
        # OUTPUT_DIR/checkpoints/<step>/): restore params directly, so the
        # train -> eval loop closes without a torch round trip. Accepts the
        # checkpoints root (latest step), a step dir, or its 'default' item.
        restored = _load_orbax_params(path)
        if restored is not None:
            logger.info("restored params from Orbax checkpoint %s", path)
            return restored
        # a directory that is not a recognizable Orbax checkpoint would fall
        # through to torch.load(dir) -> IsADirectoryError. Eval paths must
        # fail loudly (silently evaluating a fresh init reports near-zero
        # metrics); the Trainer passes allow_fresh_init=True, where training
        # from scratch is a meaningful fallback.
        msg = (f"MODEL.WEIGHTS {path} is a directory but not a recognizable "
               "Orbax checkpoint (expected OUTPUT_DIR/checkpoints, a step "
               "dir, or its 'default' item)")
        if not allow_fresh_init:
            raise FileNotFoundError(msg)
        logger.warning("%s; keeping the fresh initialization", msg)
        return jax.tree.map(np.asarray, params_template)
    local = resolve_checkpoint_path(path)
    if local is None:
        msg = (f"MODEL.WEIGHTS {path} not found locally (download it or "
               "point MODEL.WEIGHTS at a file)")
        if not allow_fresh_init:
            raise FileNotFoundError(msg)
        logger.warning("%s; keeping the fresh initialization", msg)
        return jax.tree.map(np.asarray, params_template)
    sd = load_state_dict(local)
    if not any(k.startswith(("backbone.", "sem_seg_head.")) for k in sd):
        # backbone-only zoo checkpoint (keys like "stem.conv1.weight")
        sd = {f"backbone.{k}": v for k, v in sd.items()}
    converted = convert_maskformer_state_dict(sd)
    want = _tree_shapes(jax.tree.map(np.asarray, params_template))
    got = _tree_shapes(converted)
    missing = sorted(set(want) - set(got))
    unexpected = sorted(set(got) - set(want))
    mismatched = sorted(k for k in set(want) & set(got) if want[k] != got[k])
    matched = set(want) & set(got) - set(mismatched)
    if strict and (missing or unexpected or mismatched):
        raise ValueError(
            f"checkpoint conversion mismatch:\n missing={missing[:10]}\n "
            f"unexpected={unexpected[:10]}\n shape-mismatch={mismatched[:10]}")
    if not matched:
        raise ValueError(
            f"no checkpoint key matched the model: unexpected={unexpected[:10]}")
    if missing or unexpected or mismatched:
        logger.warning(
            "partial checkpoint load: %d loaded, %d missing (e.g. %s), "
            "%d unexpected, %d shape-mismatched",
            len(matched), len(missing), missing[:3], len(unexpected),
            len(mismatched))
    def _flatten(d, prefix=""):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out.update(_flatten(v, prefix + k + "/"))
            else:
                out[prefix + k] = v
        return out

    flat = _flatten(converted)

    def pick(keypath, t):
        k = "/".join(str(getattr(p, "key", getattr(p, "name", p)))
                     for p in keypath)
        c = flat.get(k)
        if c is None or tuple(np.shape(c)) != tuple(np.shape(t)):
            return np.asarray(t)
        return np.asarray(c, dtype=np.asarray(t).dtype)

    return jax.tree_util.tree_map_with_path(pick, params_template)
