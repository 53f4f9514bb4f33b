from mulactseg_tpu.plbl.simple import within_multihot_plbl, naive_argmax_plbl
from mulactseg_tpu.plbl.cosine_prop import (
    cosine_prototype_plbl,
    selected_spx_adjacency,
)

__all__ = [
    "within_multihot_plbl",
    "naive_argmax_plbl",
    "cosine_prototype_plbl",
    "selected_spx_adjacency",
]
