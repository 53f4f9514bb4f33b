"""Whole-backbone numeric parity: a freshly-initialized torch ResNet
(standard torchvision-style structure and parameter names, written here
from scratch) forwarded in eval mode must match the Flax backbone with
weights imported through models/torch_import.py. Covers stride/dilation
geometry, padding, maxpool, downsample wiring and BN semantics at once."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

from mulactseg_tpu.models.resnet import ResNet
from mulactseg_tpu.models.torch_import import torch_state_dict_to_variables


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 dilation=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                               padding=dilation, dilation=dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU()
        self.downsample = downsample

    def forward(self, x):
        idt = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(out + idt)


class TorchResNetStem(nn.Module):
    """Deep-stem ResNet trunk with the reference's parameter names
    (conv1.{0,3,6}, bn1, layerL.B.*)."""

    def __init__(self, layers=(2, 2, 2, 2), stem_width=16,
                 dilate=(False, False, True), planes=(16, 32, 64, 128)):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.Conv2d(3, stem_width, 3, 2, 1, bias=False),
            nn.BatchNorm2d(stem_width), nn.ReLU(),
            nn.Conv2d(stem_width, stem_width, 3, 1, 1, bias=False),
            nn.BatchNorm2d(stem_width), nn.ReLU(),
            nn.Conv2d(stem_width, stem_width * 2, 3, 1, 1, bias=False))
        self.bn1 = nn.BatchNorm2d(stem_width * 2)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.inplanes = stem_width * 2
        self.dilation = 1
        strides = (1, 2, 2, 2)
        for i in range(4):
            stride = strides[i]
            prev_dilation = self.dilation
            if i > 0 and dilate[i - 1]:
                self.dilation *= stride
                stride = 1
            blocks = []
            ds = None
            if stride != 1 or self.inplanes != planes[i] * 4:
                ds = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes[i] * 4, 1, stride,
                              bias=False),
                    nn.BatchNorm2d(planes[i] * 4))
            blocks.append(TorchBottleneck(self.inplanes, planes[i], stride,
                                          ds, prev_dilation))
            self.inplanes = planes[i] * 4
            for _ in range(1, layers[i]):
                blocks.append(TorchBottleneck(self.inplanes, planes[i],
                                              dilation=self.dilation))
            setattr(self, f"layer{i + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        low = self.layer1(x)
        out = self.layer4(self.layer3(self.layer2(low)))
        return low, out


def test_backbone_forward_parity_with_torch():
    torch.manual_seed(0)
    tm = TorchResNetStem()
    # randomize BN running stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)
                m.weight.uniform_(0.8, 1.2)
                m.bias.uniform_(-0.1, 0.1)
    tm.eval()
    x = torch.randn(1, 3, 65, 65)
    with torch.no_grad():
        low_t, out_t = tm(x)
    low_t = low_t.numpy().transpose(0, 2, 3, 1)
    out_t = out_t.numpy().transpose(0, 2, 3, 1)

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    converted = torch_state_dict_to_variables(sd)

    fm = ResNet(layers=(2, 2, 2, 2), deep_stem=True, stem_width=16,
                replace_stride_with_dilation=(False, False, True),
                stage_planes=(16, 32, 64, 128))
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    variables = {"params": converted["params"]["backbone"],
                 "batch_stats": converted["batch_stats"]["backbone"]}
    taps = fm.apply(variables, xj, train=False)
    np.testing.assert_allclose(np.asarray(taps["low_level"]), low_t,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(taps["out"]), out_t,
                               rtol=1e-4, atol=2e-4)


def test_bilinear_resize_matches_torch_interpolate():
    """The V3+ head's F.interpolate(align_corners=False) must equal
    jax.image.resize(method='bilinear') — both use half-pixel centers.
    resize_bilinear (our wrapper) must match too, including its
    integer-factor phase-lerp fast path (14,18)/(28,36)/(21,27) and the
    factor-1-on-one-axis case (7, 18)."""
    from mulactseg_tpu.models.layers import resize_bilinear

    torch.manual_seed(1)
    x = torch.randn(1, 7, 9, 5)  # NHWC for jax
    xt = x.permute(0, 3, 1, 2)
    for size in ((14, 18), (28, 36), (21, 27), (21, 18), (33, 33), (5, 7)):
        want = torch.nn.functional.interpolate(
            xt, size=size, mode="bilinear", align_corners=False)
        want = want.permute(0, 2, 3, 1).numpy()
        got = jax.image.resize(jnp.asarray(x.numpy()),
                               (1, size[0], size[1], 5), method="bilinear",
                               antialias=False)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-5)
        ours = resize_bilinear(jnp.asarray(x.numpy()), size)
        np.testing.assert_allclose(np.asarray(ours), want, rtol=1e-5,
                                   atol=1e-5)
