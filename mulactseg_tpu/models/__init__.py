from mulactseg_tpu.models.factory import get_model, MODEL_NAMES
from mulactseg_tpu.models.deeplab import (
    ASPP,
    DeepLabHeadV3,
    DeepLabHeadV3Plus,
    DeepLabV3,
)
from mulactseg_tpu.models.resnet import (
    ResNet,
    resnet50,
    resnet101,
    resnet50deepstem,
    resnet101deepstem,
)
from mulactseg_tpu.models.mobilenet import MobileNetV2, mobilenet_v2

__all__ = [
    "get_model",
    "MODEL_NAMES",
    "ASPP",
    "DeepLabHeadV3",
    "DeepLabHeadV3Plus",
    "DeepLabV3",
    "ResNet",
    "resnet50",
    "resnet101",
    "resnet50deepstem",
    "resnet101deepstem",
    "MobileNetV2",
    "mobilenet_v2",
]
