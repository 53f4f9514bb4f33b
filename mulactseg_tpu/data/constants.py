"""Dataset constants: Cityscapes 34->19 train-id LUT and color maps
(/root/reference/dataloader/constant.py:6-90), VOC color map
(dataloader/dataset.py voc_cmap)."""

from __future__ import annotations

import numpy as np

# Cityscapes label id -> train id (255 = ignore). Derived from the standard
# cityscapesscripts table the reference encodes at dataloader/constant.py:6-40.
_CITYSCAPES_ID_TO_TRAIN = {
    7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7, 21: 8, 22: 9,
    23: 10, 24: 11, 25: 12, 26: 13, 27: 14, 28: 15, 31: 16, 32: 17, 33: 18,
}

ID_TO_TRAIN_ID = np.full(256, 255, dtype=np.uint8)
for k, v in _CITYSCAPES_ID_TO_TRAIN.items():
    ID_TO_TRAIN_ID[k] = v

CITYSCAPES_CLASSES = (
    "road", "sidewalk", "building", "wall", "fence", "pole",
    "traffic light", "traffic sign", "vegetation", "terrain", "sky",
    "person", "rider", "car", "truck", "bus", "train", "motorcycle",
    "bicycle",
)

TRAIN_ID_TO_COLOR = np.asarray([
    (128, 64, 128), (244, 35, 232), (70, 70, 70), (102, 102, 156),
    (190, 153, 153), (153, 153, 153), (250, 170, 30), (220, 220, 0),
    (107, 142, 35), (152, 251, 152), (70, 130, 180), (220, 20, 60),
    (255, 0, 0), (0, 0, 142), (0, 0, 70), (0, 60, 100), (0, 80, 100),
    (0, 0, 230), (119, 11, 32), (0, 0, 0),
], dtype=np.uint8)

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)

VOC_CLASSES = (
    "background", "aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
    "car", "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
    "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)


def voc_cmap(N: int = 256) -> np.ndarray:
    """Standard VOC palette (dataloader/dataset.py voc_cmap)."""
    def bitget(v, i):
        return (v >> i) & 1

    cmap = np.zeros((N, 3), dtype=np.uint8)
    for i in range(N):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= bitget(c, 0) << (7 - j)
            g |= bitget(c, 1) << (7 - j)
            b |= bitget(c, 2) << (7 - j)
            c >>= 3
        cmap[i] = (r, g, b)
    return cmap


def decode_cityscapes(train_ids: np.ndarray) -> np.ndarray:
    t = np.where(train_ids == 255, 19, train_ids)
    return TRAIN_ID_TO_COLOR[t]


# SYNTHIA raw id -> cityscapes train id (dataloader/constant.py:88-90:
# syn_id_to_train_id, 255 = ignore). Index = SYNTHIA label id.
SYN_ID_TO_TRAIN_ID = np.array(
    [255, 10, 2, 0, 1, 4, 8, 5, 13, 7, 11, 18, 17,
     255, 255, 6, 9, 12, 14, 15, 16, 3, 255, 255, 255,
     255, 255, 255, 255, 255, 255, 255, 255, 255, 255], dtype=np.uint8)
