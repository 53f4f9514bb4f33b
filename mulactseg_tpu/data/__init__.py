from mulactseg_tpu.data.loader import DataProvider, collate
from mulactseg_tpu.data.synthetic import (
    SyntheticRegionDataset,
    grid_superpixels,
    multi_hot_from_gt,
)
from mulactseg_tpu.data.datasets import (
    EvalRegionDatasetAll,
    RegionDatasetOr,
    RegionDatasetPlbl,
    ValDataset,
    encode_cityscapes,
    encode_identity,
    load_region_dict,
    open_spx,
)
from mulactseg_tpu.data.transforms import (
    PairedTransform,
    get_train_transform,
    get_val_transform,
)

__all__ = [
    "DataProvider", "collate", "SyntheticRegionDataset", "grid_superpixels",
    "multi_hot_from_gt", "EvalRegionDatasetAll", "RegionDatasetOr",
    "RegionDatasetPlbl", "ValDataset", "encode_cityscapes",
    "encode_identity", "load_region_dict", "open_spx", "PairedTransform",
    "get_train_transform", "get_val_transform",
]
