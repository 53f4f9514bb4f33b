"""Full flagship-model numeric parity: a torch twin of
deeplabv3pluswn_resnet50deepstem (reference module structure and
parameter names, written from scratch) in eval mode must match the Flax
model with weights imported via torch_state_dict_to_variables — logits
and feat_forward features both."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional

from tests.test_backbone_parity import TorchResNetStem
from mulactseg_tpu.models import get_model
from mulactseg_tpu.models.deeplab import DeepLabHeadV3Plus, DeepLabV3
from mulactseg_tpu.models.resnet import ResNet
from mulactseg_tpu.models.torch_import import torch_state_dict_to_variables


def _cbr(cin, cout, k, dilation=1):
    pad = dilation * (k - 1) // 2
    return [nn.Conv2d(cin, cout, k, padding=pad, dilation=dilation,
                      bias=False), nn.BatchNorm2d(cout), nn.ReLU()]


class TorchASPP(nn.Module):
    def __init__(self, cin, rates, cout=64):
        super().__init__()
        mods = [nn.Sequential(*_cbr(cin, cout, 1))]
        for r in rates:
            mods.append(nn.Sequential(*_cbr(cin, cout, 3, r)))
        mods.append(nn.Sequential(nn.AdaptiveAvgPool2d(1),
                                  nn.Conv2d(cin, cout, 1, bias=False),
                                  nn.BatchNorm2d(cout), nn.ReLU()))
        self.convs = nn.ModuleList(mods)
        self.project = nn.Sequential(*_cbr(5 * cout, cout, 1),
                                     nn.Dropout(0.1))

    def forward(self, x):
        size = x.shape[-2:]
        res = []
        for i, conv in enumerate(self.convs):
            y = conv(x)
            if i == len(self.convs) - 1:
                y = F.interpolate(y, size=size, mode="bilinear",
                                  align_corners=False)
            res.append(y)
        return self.project(torch.cat(res, 1))


class TorchWNHead(nn.Module):
    def __init__(self, cin, low_cin, num_classes, rates, cout=64):
        super().__init__()
        self.project = nn.Sequential(*_cbr(low_cin, 12, 1))
        self.aspp = TorchASPP(cin, rates, cout)
        self.classifier = nn.Sequential(*_cbr(cout + 12, cout, 3),
                                        *_cbr(cout, cout, 3))
        final = nn.Conv2d(cout, num_classes, 1, bias=False)
        self.proxy = final.weight

    def forward(self, feats):
        low = self.project(feats["low_level"])
        y = self.aspp(feats["out"])
        y = F.interpolate(y, size=low.shape[-2:], mode="bilinear",
                          align_corners=False)
        y = self.classifier(torch.cat([low, y], 1))
        feat = F.normalize(y)
        proxy = F.normalize(self.proxy, dim=1)
        return feat, F.conv2d(feat, proxy)


class TorchDeepLab(nn.Module):
    def __init__(self, num_classes=7):
        super().__init__()
        self.backbone = TorchResNetStem(layers=(2, 2, 2, 2), stem_width=16,
                                        dilate=(False, False, True))
        self.classifier = TorchWNHead(512, 64, num_classes, (6, 12, 18))

    def forward(self, x):
        size = x.shape[-2:]
        low, out = self.backbone(x)
        feat, logits = self.classifier({"low_level": low, "out": out})
        logits = F.interpolate(logits, size=size, mode="bilinear",
                               align_corners=False)
        feat = F.interpolate(feat, size=size, mode="bilinear",
                             align_corners=False)
        return feat, logits


def test_full_model_parity_with_torch():
    torch.manual_seed(0)
    tm = TorchDeepLab(num_classes=7)
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
        feat_t, logits_t = tm(x)
    feat_t = feat_t.numpy().transpose(0, 2, 3, 1)
    logits_t = logits_t.numpy().transpose(0, 2, 3, 1)

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    converted = torch_state_dict_to_variables(sd, wn_head=True)

    fm = DeepLabV3(
        backbone=ResNet(layers=(2, 2, 2, 2), deep_stem=True, stem_width=16,
                        replace_stride_with_dilation=(False, False, True),
                        stage_planes=(16, 32, 64, 128)),
        classifier=DeepLabHeadV3Plus(7, (6, 12, 18), variant="wn",
                                     low_channels=12, mid_channels=64))
    # head channel widths differ from defaults (48/256) in this small twin;
    # flax params come wholly from the converted tree so only names matter
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    feat_j, logits_j = fm.apply(
        {"params": converted["params"],
         "batch_stats": converted["batch_stats"]},
        xj, train=False, return_feat=True)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(feat_j), feat_t, rtol=1e-4,
                               atol=1e-4)
