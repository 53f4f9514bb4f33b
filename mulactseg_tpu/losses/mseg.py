"""Mixed-superpixel-scale (mseg) partial-label loss.

Semantics of MultisegGroupMultiLabelCE / MultisegMultiChoiceCE
(/root/reference/trainer/active_joint_multi_predignore_mseg.py:11-112):
an image carries annotations at several superpixel granularities
(nseg_list, ascending); both loss terms sum over every present level with
ONE batch-global `num_valid = 1 + N` normalizer each, exactly like the
single-scale losses.

TPU-first restructuring: the per-(image, level) Python loop becomes a
static loop over the (small, fixed) level axis of stacked (B, S, H, W)
superpixel/mask tensors, each level one dense masked pass — absent
levels contribute nothing because their spmask rows are all-False
(`nseg_lbl` indicator, mseg_region_cityscapes_or_tensor.py:94-96).

Reference quirks reproduced on purpose:
  - the group term's temperature is hardcoded to 1.0 upstream
    (MultisegGroupMultiLabelCE.__init__ passes temperature=1.0 to super()
    regardless of the group_ce_temp argument, _mseg.py:13) — callers who
    want parity must pass group_ce_temp=1.0 (the criterion does);
  - the MC term counts EVERY spmask pixel in num_valid (no empty-target
    filter, _mseg.py:103-104), unlike MultiChoiceCE;
  - the total is `coeff * mc + group` — coeff_gm is not applied
    (_mseg.py:147).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from mulactseg_tpu.ops.segment import segment_max_grad

EPS = 1e-8


def mseg_multi_choice_ce(logits, targets_by_level: Sequence[jnp.ndarray],
                         spx_levels, spmask_levels, *, temp=1.0):
    """Merged-positive CE over every annotation level.

    logits:            (B, H, W, C)  [C = num_classes + 1, predignore]
    targets_by_level:  per level (B, nseg_s, C) multi-hot
    spx_levels:        (B, S, H, W) int32, level-stacked superpixel maps
    spmask_levels:     (B, S, H, W) bool, all-False rows for absent levels
    """
    B, H, W, C = logits.shape
    S = spx_levels.shape[1]
    probs = jax.nn.softmax(logits.astype(jnp.float32) / temp, axis=-1)
    probs = probs.reshape(B, H * W, C)
    loss = 0.0
    count = 0.0
    for s in range(S):
        spx = spx_levels[:, s].reshape(B, H * W).astype(jnp.int32)
        mask = spmask_levels[:, s].reshape(B, H * W)
        trg_pixel = jnp.take_along_axis(
            targets_by_level[s].astype(jnp.float32), spx[:, :, None], axis=1)
        pos = jnp.sum(probs * trg_pixel, axis=-1)
        nll = -jnp.log(pos + EPS)
        loss = loss + jnp.sum(jnp.where(mask, nll, 0.0))
        count = count + jnp.sum(mask)
    return loss / (1.0 + count)


def mseg_group_multi_label_ce(logits, targets_by_level, spx_levels,
                              spmask_levels, *, nseg_list: Sequence[int],
                              temp=1.0):
    """MIL group loss over every annotation level: per present
    (superpixel, candidate-class) pair, -log max-prob inside the
    superpixel, one global normalizer (_mseg.py:35-58)."""
    B, H, W, C = logits.shape
    S = spx_levels.shape[1]
    probs = jax.nn.softmax(logits.astype(jnp.float32) / temp, axis=-1)
    probs = probs.reshape(B, H * W, C)
    loss = 0.0
    count = 0.0
    for s in range(S):
        nseg = int(nseg_list[s])
        spx = spx_levels[:, s].reshape(B, H * W).astype(jnp.int32)
        mask = spmask_levels[:, s].reshape(B, H * W)
        sid = jnp.where(mask, spx, nseg)

        def one(sid_i, probs_i):
            mx, argpix = segment_max_grad(probs_i, sid_i, nseg)
            return mx, argpix[:, 0] < probs_i.shape[0]

        mx, present = jax.vmap(one)(sid, probs)  # (B, nseg, C), (B, nseg)
        entry = (targets_by_level[s] > 0.5) & present[:, :, None]
        nll = -jnp.log(mx + EPS)
        loss = loss + jnp.sum(jnp.where(entry, nll, 0.0))
        count = count + jnp.sum(entry)
    return loss / (1.0 + count)


def mseg_joint_loss(logits, targets_by_level, spx_levels, spmask_levels, *,
                    nseg_list, coeff=16.0, multi_ce_temp=0.1,
                    group_ce_temp=1.0):
    """coeff * MC + Group (active_joint_multi_predignore_mseg.py:145-147)."""
    pos = mseg_multi_choice_ce(logits, targets_by_level, spx_levels,
                               spmask_levels, temp=multi_ce_temp)
    group = mseg_group_multi_label_ce(logits, targets_by_level, spx_levels,
                                      spmask_levels, nseg_list=nseg_list,
                                      temp=group_ce_temp)
    total = coeff * pos + group
    return total, {"train_loss": total, "pos_loss": pos, "group_loss": group}
