"""ResNet backbone (detectron2-equivalent, TPU-native NHWC).

Reproduces d2's `build_resnet_backbone` semantics used by the reference
configs (Base-COCO-InstanceSegmentation.yaml:4,9-15): basic stem
(7x7/2 conv + FrozenBN + relu + 3x3/2 maxpool), bottleneck stages res2-res5,
STRIDE_IN_1X1 switch, FrozenBN everywhere, FREEZE_AT. Weights import from the
torchvision R-50 checkpoint (replacing tools/convert-torchvision-to-d2.py).

FrozenBN parameters live in the regular param tree but under module names
matching ``frozen_bn``; the optimizer factory gives them zero learning rate
(d2's FrozenBatchNorm2d has no trainable params).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.shape_spec import ShapeSpec
from ...utils.registry import BACKBONE_REGISTRY


class FrozenBN(nn.Module):
    """Affine-only BatchNorm with frozen statistics (d2 FrozenBatchNorm2d,
    eps=1e-5). Stores weight/bias/mean/var so torch checkpoints convert 1:1."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("weight", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        scale = w * jax.lax.rsqrt(var + self.eps)
        return x * scale + (b - mean * scale)


def _conv(features: int, kernel: int, stride: int = 1, dilation: int = 1,
          name: str = None, dtype=None, groups: int = 1):
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        kernel_dilation=(dilation, dilation),
        feature_group_count=groups,
        use_bias=False,
        dtype=dtype,
        name=name,
    )


class BottleneckBlock(nn.Module):
    """d2 BottleneckBlock: 1x1 -> 3x3 -> 1x1 with FrozenBN, residual add."""

    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    stride_in_1x1: bool = False
    dilation: int = 1
    has_shortcut: bool = False
    num_groups: int = 1  # ResNeXt grouped 3x3 (d2 BottleneckBlock num_groups)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        stride_1x1, stride_3x3 = (
            (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        )
        out = _conv(self.bottleneck_channels, 1, stride_1x1, name="conv1", dtype=self.dtype)(x)
        out = FrozenBN(self.bottleneck_channels, name="conv1_frozen_bn")(out)
        out = nn.relu(out)
        out = _conv(self.bottleneck_channels, 3, stride_3x3, self.dilation,
                    name="conv2", dtype=self.dtype,
                    groups=self.num_groups)(out)
        out = FrozenBN(self.bottleneck_channels, name="conv2_frozen_bn")(out)
        out = nn.relu(out)
        out = _conv(self.out_channels, 1, name="conv3", dtype=self.dtype)(out)
        out = FrozenBN(self.out_channels, name="conv3_frozen_bn")(out)
        if self.has_shortcut:
            sc = _conv(self.out_channels, 1, self.stride, name="shortcut", dtype=self.dtype)(x)
            sc = FrozenBN(self.out_channels, name="shortcut_frozen_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


_STAGE_BLOCKS = {50: [3, 4, 6, 3], 101: [3, 4, 23, 3], 152: [3, 8, 36, 3]}


class ResNet(nn.Module):
    """NHWC ResNet; returns a dict of res2..res5 feature maps."""

    depth: int = 50
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    stride_in_1x1: bool = False
    num_groups: int = 1
    width_per_group: int = 64
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    res5_dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        # stem: 7x7/2 conv + FrozenBN + relu + maxpool 3x3/2 (pad 1)
        out = _conv(self.stem_out_channels, 7, 2, name="stem_conv1", dtype=self.dtype)(x.astype(self.dtype))
        out = FrozenBN(self.stem_out_channels, name="stem_conv1_frozen_bn")(out)
        out = nn.relu(out)
        out = nn.max_pool(out, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        blocks_per_stage = _STAGE_BLOCKS[self.depth]
        bottleneck = self.num_groups * self.width_per_group
        out_ch = self.res2_out_channels
        feats: Dict[str, jax.Array] = {}
        in_ch = self.stem_out_channels
        for stage_idx, nblocks in enumerate(blocks_per_stage):
            name = f"res{stage_idx + 2}"
            first_stride = 1 if stage_idx == 0 else 2
            dilation = self.res5_dilation if name == "res5" else 1
            if dilation > 1:
                first_stride = 1
            for block_idx in range(nblocks):
                stride = first_stride if block_idx == 0 else 1
                out = BottleneckBlock(
                    out_channels=out_ch,
                    bottleneck_channels=bottleneck,
                    stride=stride,
                    stride_in_1x1=self.stride_in_1x1,
                    dilation=dilation,
                    has_shortcut=(block_idx == 0 and (in_ch != out_ch or stride != 1)),
                    num_groups=self.num_groups,
                    dtype=self.dtype,
                    name=f"{name}_{block_idx}",
                )(out)
                in_ch = out_ch
            if name in self.out_features:
                feats[name] = out
            bottleneck *= 2
            out_ch *= 2
        return feats

    def output_shape(self) -> Dict[str, ShapeSpec]:
        strides = {"res2": 4, "res3": 8, "res4": 16, "res5": 32}
        ch = {"res2": self.res2_out_channels}
        ch["res3"] = ch["res2"] * 2
        ch["res4"] = ch["res3"] * 2
        ch["res5"] = ch["res4"] * 2
        return {
            f: ShapeSpec(channels=ch[f], stride=strides[f]) for f in self.out_features
        }


@BACKBONE_REGISTRY.register(name="build_resnet_backbone")
def build_resnet_backbone(cfg) -> ResNet:
    r = cfg.MODEL.RESNETS
    import jax.numpy as _jnp
    dtype = _jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else _jnp.float32
    return ResNet(
        dtype=dtype,
        depth=r.DEPTH,
        out_features=tuple(r.OUT_FEATURES),
        stride_in_1x1=r.STRIDE_IN_1X1,
        num_groups=r.NUM_GROUPS,
        width_per_group=r.WIDTH_PER_GROUP,
        stem_out_channels=r.STEM_OUT_CHANNELS,
        res2_out_channels=r.RES2_OUT_CHANNELS,
        res5_dilation=r.RES5_DILATION,
    )
