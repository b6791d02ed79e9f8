"""ResNet backbone parity vs a torch reference (torchvision-structured).

torchvision isn't in the image, so the test defines the torch R50 locally
(identical module/state_dict layout), runs it with FrozenBN semantics
(eval-mode BN), converts the weights, and compares feature maps.
"""

import numpy as np
import torch
import torch.nn as tnn

import jax.numpy as jnp

from mp_former_tpu.models.backbone.resnet import ResNet
from mp_former_tpu.engine.convert import resnet_params_from_torchvision


class TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        # torchvision Bottleneck: stride lives on conv2 (3x3) == d2 STRIDE_IN_1X1=False
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet50(tnn.Module):
    def __init__(self):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, 3)
        self.layer2 = self._make_layer(128, 4, stride=2)
        self.layer3 = self._make_layer(256, 6, stride=2)
        self.layer4 = self._make_layer(512, 3, stride=2)

    def _make_layer(self, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )
        layers = [TorchBottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [TorchBottleneck(self.inplanes, planes) for _ in range(blocks - 1)]
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        feats = {}
        for i, layer in enumerate([self.layer1, self.layer2, self.layer3, self.layer4]):
            x = layer(x)
            feats[f"res{i + 2}"] = x
        return feats


def test_resnet50_matches_torch():
    torch.manual_seed(0)
    tmodel = TorchResNet50().eval()
    # randomize BN stats so the frozen-stats path is actually exercised
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = resnet_params_from_torchvision(sd, depth=50)

    x = np.random.RandomState(1).randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        want = {k: v.numpy() for k, v in tmodel(torch.from_numpy(x)).items()}

    model = ResNet(depth=50, stride_in_1x1=False)
    got = model.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))

    for k in ("res2", "res3", "res4", "res5"):
        g = np.asarray(got[k]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(g, want[k], rtol=1e-4, atol=1e-4), k


def test_output_shape_metadata():
    model = ResNet(depth=50)
    shapes = model.output_shape()
    assert shapes["res2"].channels == 256 and shapes["res2"].stride == 4
    assert shapes["res5"].channels == 2048 and shapes["res5"].stride == 32
