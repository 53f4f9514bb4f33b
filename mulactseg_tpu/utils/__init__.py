from mulactseg_tpu.utils.metrics import MeanIoU, IoUIgnore, confusion_matrix
from mulactseg_tpu.utils.schedule import poly_lr, ramp_up, sigmoid_ramp_up

__all__ = [
    "MeanIoU",
    "IoUIgnore",
    "confusion_matrix",
    "poly_lr",
    "ramp_up",
    "sigmoid_ramp_up",
]
