"""Model factory mirroring the reference's name registry
(/root/reference/models/__init__.py:21-51 and
models/segmentation/modeling.py:9-46): OS8 -> dilate layers 3+4 with ASPP
rates [12,24,36]; OS16 -> dilate layer 4 with rates [6,12,18]."""

from __future__ import annotations

import flax.linen as nn

from mulactseg_tpu.models.deeplab import (
    DeepLabHeadV2,
    DeepLabHeadV3,
    DeepLabHeadV3Plus,
    DeepLabV3,
)
from mulactseg_tpu.models import resnet as _resnet
from mulactseg_tpu.models.mobilenet import mobilenet_v2

MODEL_NAMES = (
    "deeplabv3_resnet50", "deeplabv3plus_resnet50", "deeplabv3plusc1_resnet50",
    "deeplabv3_resnet101", "deeplabv3plus_resnet101", "deeplabv3_mobilenet",
    "deeplabv3plus_mobilenet", "deeplabv3pluswn_resnet50deepstem",
    "deeplabv2_resnet101", "deeplabv2_mobilenet",
    "deeplabv3pluswn_resnet101deepstem", "deeplabv3pluswn_resnet50",
    "deeplabv3plus_resnet50deepstem", "deeplabv3plus_resnet101deepstem",
)


def _dilation_cfg(output_stride: int):
    if output_stride == 8:
        return (False, True, True), (12, 24, 36)
    return (False, False, True), (6, 12, 18)


def _resnet_backbone(name: str, output_stride: int, dtype=None):
    rswd, aspp = _dilation_cfg(output_stride)
    ctor = getattr(_resnet, name)
    return ctor(replace_stride_with_dilation=rswd, dtype=dtype), aspp


def get_model(model: str, num_classes: int, output_stride: int = 16,
              separable_conv: bool = False, dtype=None) -> nn.Module:
    """dtype: compute dtype for the conv stack (e.g. jnp.bfloat16 for the
    MXU fast path); params stay float32 and logits are returned in f32."""
    if model not in MODEL_NAMES:
        raise ValueError(f"unknown model {model!r}")
    arch, backbone_name = model.split("_", 1)

    if backbone_name == "mobilenet":
        # mobilenet ASPP rates follow modeling.py:50-53 (note: reference
        # swaps them relative to resnet)
        aspp = (12, 24, 36) if output_stride == 8 else (6, 12, 18)
        backbone = mobilenet_v2(output_stride=output_stride)
    else:
        backbone, aspp = _resnet_backbone(backbone_name, output_stride,
                                          dtype=dtype)

    separable = separable_conv and "plus" in arch
    if arch == "deeplabv3plus":
        head = DeepLabHeadV3Plus(num_classes, aspp, variant="plain",
                                 separable=separable, dtype=dtype)
    elif arch == "deeplabv3plusc1":
        head = DeepLabHeadV3Plus(num_classes, aspp, variant="c1",
                                 separable=separable, dtype=dtype)
    elif arch == "deeplabv3pluswn":
        head = DeepLabHeadV3Plus(num_classes, aspp, variant="wn",
                                 separable=separable, dtype=dtype)
    elif arch == "deeplabv3":
        head = DeepLabHeadV3(num_classes, aspp)
    elif arch == "deeplabv2":
        head = DeepLabHeadV2(num_classes)
    else:
        raise ValueError(arch)

    return DeepLabV3(backbone=backbone, classifier=head)
