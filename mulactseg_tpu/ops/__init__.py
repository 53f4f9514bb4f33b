from mulactseg_tpu.ops.segment import (
    SegContext,
    seg_context,
    seg_count,
    seg_sum,
    seg_mean,
    seg_max,
    seg_min,
    seg_max_argmax,
    scatter_mean,
    scatter_sum,
    scatter_max,
)
from mulactseg_tpu.ops.morphology import (
    binary_dilation3x3,
    neighbor_ids_map,
    segment_adjacency,
)

__all__ = [
    "SegContext",
    "seg_context",
    "seg_count",
    "seg_sum",
    "seg_mean",
    "seg_max",
    "seg_min",
    "seg_max_argmax",
    "scatter_mean",
    "scatter_sum",
    "scatter_max",
    "binary_dilation3x3",
    "neighbor_ids_map",
    "segment_adjacency",
]
