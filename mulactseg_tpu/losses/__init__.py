from mulactseg_tpu.losses.partial import (
    multi_choice_ce,
    group_multi_label_ce,
    onehot_ce_multihot_choice,
    lossdecomp,
    rc_multi_choice_ce,
    multi_choice_ent,
)
from mulactseg_tpu.losses.standard import (
    cross_entropy,
    focal_loss,
    rcce,
    rcce_asym,
)

__all__ = [
    "multi_choice_ce",
    "group_multi_label_ce",
    "onehot_ce_multihot_choice",
    "lossdecomp",
    "rc_multi_choice_ce",
    "multi_choice_ent",
    "cross_entropy",
    "focal_loss",
    "rcce",
    "rcce_asym",
]
