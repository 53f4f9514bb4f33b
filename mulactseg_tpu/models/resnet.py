"""Flax ResNet backbones with deep-stem and output-stride dilation.

Re-implementation of the torchvision-style backbone the reference uses
(/root/reference/models/segmentation/backbone/resnet.py): Bottleneck
blocks, `replace_stride_with_dilation` for OS control (including the
torch quirk that the *first* block of a dilated stage still uses the
previous dilation, resnet.py:196-208), and the deep-stem option — three
3x3 convs with stem_width 64 replacing the 7x7 (resnet.py:142-156,
_resnet_deepstem :256-260).

Returns the feature taps DeepLabV3+ needs: {'low_level': layer1,
'out': layer4} (modeling.py:26-29).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn

from mulactseg_tpu.models.layers import (
    batch_norm,
    conv,
    kaiming_out,
    max_pool_3x3_s2,
)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    expansion: int = 4
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        dt = self.dtype
        out = conv(self.planes, 1, name="conv1", dtype=dt)(x)
        out = batch_norm(train, name="bn1", dtype=dt)(out)
        out = nn.relu(out)
        out = conv(self.planes, 3, self.stride, self.dilation, name="conv2",
                   dtype=dt)(out)
        out = batch_norm(train, name="bn2", dtype=dt)(out)
        out = nn.relu(out)
        out = conv(self.planes * self.expansion, 1, name="conv3", dtype=dt)(out)
        out = batch_norm(train, name="bn3", dtype=dt)(out)
        if self.downsample:
            identity = conv(self.planes * self.expansion, 1, self.stride,
                            name="downsample_conv", dtype=dt)(x)
            identity = batch_norm(train, name="downsample_bn", dtype=dt)(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """layers: blocks per stage, e.g. (3,4,6,3) for ResNet-50."""

    layers: Sequence[int] = (3, 4, 6, 3)
    deep_stem: bool = False
    stem_width: int = 64
    replace_stride_with_dilation: Tuple[bool, bool, bool] = (False, False, True)
    dtype: object = None
    stage_planes: Tuple[int, int, int, int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)
        if self.deep_stem:
            x = conv(self.stem_width, 3, 2, name="stem_conv1", dtype=dt)(x)
            x = batch_norm(train, name="stem_bn1", dtype=dt)(x)
            x = nn.relu(x)
            x = conv(self.stem_width, 3, 1, name="stem_conv2", dtype=dt)(x)
            x = batch_norm(train, name="stem_bn2", dtype=dt)(x)
            x = nn.relu(x)
            x = conv(self.stem_width * 2, 3, 1, name="stem_conv3", dtype=dt)(x)
        else:
            x = conv(64, 7, 2, name="conv1", dtype=dt)(x)
        x = batch_norm(train, name="bn1", dtype=dt)(x)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)

        taps = {}
        dilation = 1
        stage_planes = self.stage_planes
        stage_strides = (1, 2, 2, 2)
        inplanes = (self.stem_width * 2) if self.deep_stem else 64
        for stage in range(4):
            planes = stage_planes[stage]
            stride = stage_strides[stage]
            prev_dilation = dilation
            if stage > 0 and self.replace_stride_with_dilation[stage - 1]:
                dilation *= stride
                stride = 1
            for b in range(self.layers[stage]):
                if b == 0:
                    need_ds = stride != 1 or inplanes != planes * 4
                    x = Bottleneck(planes, stride, prev_dilation,
                                   downsample=need_ds, dtype=dt,
                                   name=f"layer{stage + 1}_{b}")(x, train)
                    inplanes = planes * 4
                else:
                    x = Bottleneck(planes, 1, dilation, dtype=dt,
                                   name=f"layer{stage + 1}_{b}")(x, train)
            if stage == 0:
                taps["low_level"] = x
        taps["out"] = x
        return taps


def resnet50(**kw):
    return ResNet(layers=(3, 4, 6, 3), deep_stem=False, **kw)


def resnet101(**kw):
    return ResNet(layers=(3, 4, 23, 3), deep_stem=False, **kw)


def resnet50deepstem(**kw):
    return ResNet(layers=(3, 4, 6, 3), deep_stem=True, stem_width=64, **kw)


def resnet101deepstem(**kw):
    return ResNet(layers=(3, 4, 23, 3), deep_stem=True, stem_width=64, **kw)
