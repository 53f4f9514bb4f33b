"""MobileNetV2 backbone with output-stride dilation (alternative backbone;
/root/reference/models/segmentation/backbone/mobilenetv2.py). Taps match
modeling.py:56-63: low_level = features[0:4] output (24 ch, stride 4),
out = features[4:-1] output (320 ch)."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from mulactseg_tpu.models.layers import batch_norm, conv


class InvertedResidual(nn.Module):
    out_ch: int
    stride: int
    expand: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand
        use_res = self.stride == 1 and in_ch == self.out_ch
        y = x
        if self.expand != 1:
            y = conv(hidden, 1, name="expand")(y)
            y = batch_norm(train, name="expand_bn")(y)
            y = nn.relu6(y)
        y = conv(hidden, 3, self.stride, self.dilation, groups=hidden,
                 name="depthwise")(y)
        y = batch_norm(train, name="dw_bn")(y)
        y = nn.relu6(y)
        y = conv(self.out_ch, 1, name="project")(y)
        y = batch_norm(train, name="project_bn")(y)
        return x + y if use_res else y


_SETTINGS = (
    # t, c, n, s
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


class MobileNetV2(nn.Module):
    output_stride: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps = {}
        y = conv(32, 3, 2, name="stem")(x)
        y = batch_norm(train, name="stem_bn")(y)
        y = nn.relu6(y)
        current_stride = 2
        dilation = 1
        block_idx = 0
        for t, c, n, s in _SETTINGS:
            for i in range(n):
                stride = s if i == 0 else 1
                if stride > 1 and current_stride >= self.output_stride:
                    d = dilation
                    dilation *= stride
                    stride = 1
                else:
                    d = dilation
                    current_stride *= stride if stride > 1 else 1
                y = InvertedResidual(c, stride, t, d,
                                     name=f"block{block_idx}")(y, train)
                block_idx += 1
                if block_idx == 3:  # end of features[0:4] (stem + 3 blocks)
                    taps["low_level"] = y
        taps["out"] = y
        return taps


def mobilenet_v2(output_stride: int = 16, **kw):
    return MobileNetV2(output_stride=output_stride, **kw)
