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


def space_to_batch(x, f: int):
    """Phase decomposition: (B,H,W,C) -> (B*f*f, H/f, W/f, C). A 3x3 conv
    with dilation f and stride 1 never mixes phases, so running it as a
    dense 3x3 conv on the phase view is EXACT — and dense convs tile onto
    the MXU far better than dilated ones. BN batch stats see the same
    pixel multiset, so they are unchanged too."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // f, f, W // f, f, C)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(B * f * f, H // f, W // f, C)


def batch_to_space(x, f: int, B: int):
    """Inverse of space_to_batch."""
    _, h, w, C = x.shape
    x = x.reshape(B, f, f, h, w, C)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(B, h * f, w * f, C)


class ResNet(nn.Module):
    """layers: blocks per stage, e.g. (3,4,6,3) for ResNet-50.

    use_space_to_batch: run the all-dilated tail of each dilated stage
    (blocks 1.. — block 0 keeps the previous dilation, the torch quirk)
    on the phase-decomposed view; exact, auto-disabled when the spatial
    dims don't divide the dilation factor."""

    layers: Sequence[int] = (3, 4, 6, 3)
    deep_stem: bool = False
    stem_width: int = 64
    replace_stride_with_dilation: Tuple[bool, bool, bool] = (False, False, True)
    dtype: object = None
    stage_planes: Tuple[int, int, int, int] = (64, 128, 256, 512)
    use_space_to_batch: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)
        if self.deep_stem:
            import os as _os

            if _os.environ.get("MULACTSEG_S2D_STEM") and \
                    x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
                # exact space-to-depth stem (layers.S2DStemConv): OFF by
                # default — measured 29.0 -> 28.7 img/s on the current
                # chip (its 3-channel conv emitter is already efficient,
                # and the 12-channel view lane-pads 12 -> 128); exactness
                # is pinned by tests, re-evaluate per TPU generation
                from mulactseg_tpu.models.layers import S2DStemConv

                x = S2DStemConv(self.stem_width, dtype=dt,
                                name="stem_conv1")(x)
            else:
                x = conv(self.stem_width, 3, 2, name="stem_conv1",
                         dtype=dt)(x)
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
            s2b_f = 0
            for b in range(self.layers[stage]):
                if b == 0:
                    need_ds = stride != 1 or inplanes != planes * 4
                    x = Bottleneck(planes, stride, prev_dilation,
                                   downsample=need_ds, dtype=dt,
                                   name=f"layer{stage + 1}_{b}")(x, train)
                    inplanes = planes * 4
                    if (self.use_space_to_batch and dilation > 1
                            and self.layers[stage] > 1
                            and x.shape[1] % dilation == 0
                            and x.shape[2] % dilation == 0):
                        s2b_f = dilation
                        B0 = x.shape[0]
                        x = space_to_batch(x, s2b_f)
                else:
                    x = Bottleneck(planes, 1,
                                   dilation // s2b_f if s2b_f else dilation,
                                   dtype=dt,
                                   name=f"layer{stage + 1}_{b}")(x, train)
            if s2b_f:
                x = batch_to_space(x, s2b_f, B0)
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
