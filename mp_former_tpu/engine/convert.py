"""Torch-checkpoint importers (replace reference tools/convert-*.py).

All converters take a flat ``{name: np.ndarray}`` state dict (load a .pth with
``torch.load(..., map_location='cpu')`` and call ``.numpy()`` on each tensor —
no torch dependency here) and emit flax param pytrees for our modules.

Layout conventions: torch Conv2d OIHW -> flax HWIO; torch Linear (out, in) ->
flax (in, out); torch nn.MultiheadAttention packed in_proj -> split q/k/v.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np


def _conv(w: np.ndarray) -> Dict[str, np.ndarray]:
    return {"kernel": np.transpose(w, (2, 3, 1, 0))}


def _bn(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "weight": sd[f"{prefix}.weight"],
        "bias": sd[f"{prefix}.bias"],
        "running_mean": sd[f"{prefix}.running_mean"],
        "running_var": sd[f"{prefix}.running_var"],
    }


def _linear(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": np.transpose(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def resnet_params_from_torchvision(sd: Dict[str, np.ndarray], depth: int = 50) -> Dict[str, Any]:
    """torchvision resnet{50,101} state_dict -> our ResNet param tree
    (replaces tools/convert-torchvision-to-d2.py + d2's loader)."""
    blocks = {50: [3, 4, 6, 3], 101: [3, 4, 23, 3], 152: [3, 8, 36, 3]}[depth]
    p: Dict[str, Any] = {
        "stem_conv1": _conv(sd["conv1.weight"]),
        "stem_conv1_frozen_bn": _bn(sd, "bn1"),
    }
    for stage, n in enumerate(blocks):
        for j in range(n):
            t = f"layer{stage + 1}.{j}"
            o = f"res{stage + 2}_{j}"
            blk: Dict[str, Any] = {}
            for k in (1, 2, 3):
                blk[f"conv{k}"] = _conv(sd[f"{t}.conv{k}.weight"])
                blk[f"conv{k}_frozen_bn"] = _bn(sd, f"{t}.bn{k}")
            if f"{t}.downsample.0.weight" in sd:
                blk["shortcut"] = _conv(sd[f"{t}.downsample.0.weight"])
                blk["shortcut_frozen_bn"] = _bn(sd, f"{t}.downsample.1")
            p[o] = blk
    return p


def swin_params_from_torch(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict[str, Any]:
    """Official Swin checkpoint (or d2 'backbone.'-prefixed) -> our
    SwinTransformer param tree (replaces tools/convert-pretrained-swin-model-to-d2.py)."""
    if prefix and not prefix.endswith("."):
        prefix += "."
    p: Dict[str, Any] = {}
    p["patch_embed_proj"] = {
        "kernel": np.transpose(sd[f"{prefix}patch_embed.proj.weight"], (2, 3, 1, 0)),
        "bias": sd[f"{prefix}patch_embed.proj.bias"],
    }
    if f"{prefix}patch_embed.norm.weight" in sd:
        p["patch_embed_norm"] = {
            "scale": sd[f"{prefix}patch_embed.norm.weight"],
            "bias": sd[f"{prefix}patch_embed.norm.bias"],
        }
    if f"{prefix}absolute_pos_embed" in sd:  # APE checkpoints (1, C, H, W)
        p["absolute_pos_embed"] = np.transpose(
            sd[f"{prefix}absolute_pos_embed"], (0, 2, 3, 1))
    # stages
    i = 0
    while f"{prefix}layers.{i}.blocks.0.norm1.weight" in sd:
        j = 0
        while f"{prefix}layers.{i}.blocks.{j}.norm1.weight" in sd:
            t = f"{prefix}layers.{i}.blocks.{j}"
            p[f"layers_{i}_blocks_{j}"] = {
                "norm1": {"scale": sd[f"{t}.norm1.weight"], "bias": sd[f"{t}.norm1.bias"]},
                "norm2": {"scale": sd[f"{t}.norm2.weight"], "bias": sd[f"{t}.norm2.bias"]},
                "attn": {
                    "qkv": _linear(sd, f"{t}.attn.qkv"),
                    "proj": _linear(sd, f"{t}.attn.proj"),
                    "relative_position_bias_table": sd[f"{t}.attn.relative_position_bias_table"],
                },
                "mlp_fc1": _linear(sd, f"{t}.mlp.fc1"),
                "mlp_fc2": _linear(sd, f"{t}.mlp.fc2"),
            }
            j += 1
        if f"{prefix}layers.{i}.downsample.norm.weight" in sd:
            t = f"{prefix}layers.{i}.downsample"
            p[f"layers_{i}_downsample"] = {
                "norm": {"scale": sd[f"{t}.norm.weight"], "bias": sd[f"{t}.norm.bias"]},
                "reduction": _linear(sd, f"{t}.reduction"),
            }
        i += 1
    for k in list(sd):
        # per-out-feature norms: 'norm0.weight' / d2 'backbone.norm0.weight'
        m = re.match(rf"^{re.escape(prefix)}norm(\d)\.weight$", k)
        if m:
            n = m.group(1)
            p[f"norm{n}"] = {
                "scale": sd[f"{prefix}norm{n}.weight"],
                "bias": sd[f"{prefix}norm{n}.bias"],
            }
    return p


def d2_resnet_params_from_state_dict(
    sd: Dict[str, np.ndarray], prefix: str = "backbone."
) -> Dict[str, Any]:
    """detectron2-format ResNet weights (as found inside the released
    MP-Former model_final.pth: backbone.stem.conv1.*, backbone.res2.0.conv1.*)."""
    p: Dict[str, Any] = {
        "stem_conv1": _conv(sd[f"{prefix}stem.conv1.weight"]),
        "stem_conv1_frozen_bn": _bn(sd, f"{prefix}stem.conv1.norm"),
    }
    pat = re.compile(rf"^{re.escape(prefix)}(res\d)\.(\d+)\.conv1\.weight$")
    stages: Dict[str, int] = {}
    for k in sd:
        m = pat.match(k)
        if m:
            stages[m.group(1)] = max(stages.get(m.group(1), 0), int(m.group(2)) + 1)
    for stage, n in stages.items():
        for j in range(n):
            t = f"{prefix}{stage}.{j}"
            blk: Dict[str, Any] = {}
            for k in (1, 2, 3):
                blk[f"conv{k}"] = _conv(sd[f"{t}.conv{k}.weight"])
                blk[f"conv{k}_frozen_bn"] = _bn(sd, f"{t}.conv{k}.norm")
            if f"{t}.shortcut.weight" in sd:
                blk["shortcut"] = _conv(sd[f"{t}.shortcut.weight"])
                blk["shortcut_frozen_bn"] = _bn(sd, f"{t}.shortcut.norm")
            p[f"{stage}_{j}"] = blk
    return p
