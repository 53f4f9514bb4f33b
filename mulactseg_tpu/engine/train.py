"""Jitted training steps for every trainer family.

The reference selects trainers by module name via importlib
(train_AL.py:33); here the same method strings key a criterion registry,
and each method becomes one pjit-compiled step: forward (BN in train
mode, batch-synced automatically under data-parallel sharding), partial-
label loss, backward, AdamW+poly update — no per-image Python loops, no
host sync. NaN guards mirror trainer/active_joint_multi.py:17-29
(zero_if_nan per component).

Method coverage (SURVEY.md section 2e): 29 trainer methods — the shipped
stage-1 trainers (cityscapes/VOC lossdecomp), joint group+MC, the
mclossablation/lscale/wgroup/exclusivece/multient/precise ablations,
lossdecomp rc/topone, the hier/async family, the online-plbl family,
pwce, top1plbl, and the plain-CE stage-2/slide trainers. See CRITERIA.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from mulactseg_tpu.losses import (
    cross_entropy,
    group_multi_label_ce,
    lossdecomp,
    multi_choice_ce,
    multi_choice_ent,
    onehot_ce_multihot_choice,
)
from mulactseg_tpu.losses.partial import (
    exclusive_ce,
    top_one_plbl_loss,
    multi_choice_ce_only_dominant,
    multi_choice_ce_scale,
    onehot_ce_multihot_rc,
    onehot_ce_multihot_topone,
    weighted_group_multi_label_ce,
)


def _zero_if_nan(x):
    return jnp.where(jnp.isfinite(x), x, 0.0)


def _joint_loss(cfg, slice_last):
    def fn(logits, batch):
        group = group_multi_label_ce(
            logits, batch["target"], batch["spx"], batch["spmask"],
            nseg=cfg.nseg, temp=cfg.group_ce_temp, slice_last=slice_last)
        pos = multi_choice_ce(
            logits, batch["target"], batch["spx"], batch["spmask"],
            temp=cfg.multi_ce_temp, slice_last=slice_last)
        group, pos = _zero_if_nan(group), _zero_if_nan(pos)
        total = cfg.coeff * pos + cfg.coeff_gm * group
        return total, {"train_loss": total, "pos_loss": pos,
                       "group_loss": group}
    return fn


def _lossdecomp_loss(cfg):
    def fn(logits, batch, nchw=False):
        if "target_bits" in batch:
            # fast path: loader-packed per-pixel candidate bitmasks kill
            # the latency-bound (S,C)-table row gathers (losses/fused.py)
            from mulactseg_tpu.losses.fused import lossdecomp_fused

            total, aux = lossdecomp_fused(
                logits, batch["target_bits"], batch["target"], batch["spx"],
                nseg=cfg.nseg, coeff=cfg.coeff, coeff_mc=cfg.coeff_mc,
                coeff_gm=cfg.coeff_gm, multi_ce_temp=cfg.multi_ce_temp,
                group_ce_temp=cfg.group_ce_temp, nchw=nchw)
        else:
            if nchw:
                logits = jnp.transpose(logits, (0, 2, 3, 1))
            total, aux = lossdecomp(
                logits, batch["target"], batch["spx"], batch["spmask"],
                nseg=cfg.nseg, coeff=cfg.coeff, coeff_mc=cfg.coeff_mc,
                coeff_gm=cfg.coeff_gm, multi_ce_temp=cfg.multi_ce_temp,
                group_ce_temp=cfg.group_ce_temp)
        return _zero_if_nan(total), aux
    # the model can hand this criterion (B, C, H, W) logits (DeepLabV3
    # nchw_logits=True): the layout change then happens at head
    # resolution instead of as a full-res transpose pair
    fn.accepts_nchw = True
    return fn


def _mclossablation2_loss(cfg):
    """group(only multi) + CE on dominant/one-hot pixels."""
    def fn(logits, batch):
        group = group_multi_label_ce(
            logits, batch["target"], batch["spx"], batch["spmask"],
            nseg=cfg.nseg, temp=cfg.group_ce_temp, slice_last=False,
            only_multi=True)
        ce, _ = onehot_ce_multihot_choice(
            logits, batch["target"], batch["spx"], batch["spmask"],
            temp=cfg.multi_ce_temp)
        total = cfg.coeff * ce + cfg.coeff_gm * group
        return _zero_if_nan(total), {"train_loss": total, "ce_loss": ce,
                                     "group_loss": group}
    return fn


def _ce_loss(cfg):
    def fn(logits, batch):
        loss = cross_entropy(logits, batch["labels"], temp=cfg.ce_temp,
                             ignore_index=cfg.ignore_idx)
        return loss, {"train_loss": loss}
    return fn


def _precise_loss(cfg, with_group=True):
    """Oracle trainers (active_joint_multi_predignore_precise.py:21-46 /
    _multice_precise): precise CE on the GT masked to selected
    superpixels, plus group or MC partial terms."""
    def fn(logits, batch):
        ce = _zero_if_nan(cross_entropy(logits, batch["labels"],
                                        temp=cfg.ce_temp,
                                        ignore_index=cfg.ignore_idx))
        if with_group:
            other = group_multi_label_ce(
                logits, batch["target"], batch["spx"], batch["spmask"],
                nseg=cfg.nseg, temp=cfg.group_ce_temp, slice_last=False)
        else:
            other = multi_choice_ce(
                logits, batch["target"], batch["spx"], batch["spmask"],
                temp=cfg.multi_ce_temp, slice_last=False)
        total = ce + other
        return total, {"train_loss": total, "ce_loss": ce,
                       ("group_loss" if with_group else "pos_loss"): other}
    return fn


def _multient_loss(cfg):
    """coeff*MC + group + entcoeff*entropy-in-candidates
    (active_joint_multi_predignore_multient.py:103-106)."""
    def fn(logits, batch):
        args = (logits, batch["target"], batch["spx"], batch["spmask"])
        group = group_multi_label_ce(*args, nseg=cfg.nseg,
                                     temp=cfg.group_ce_temp,
                                     slice_last=False)
        pos = multi_choice_ce(*args, temp=cfg.multi_ce_temp,
                              slice_last=False)
        ent = multi_choice_ent(*args, temp=cfg.multi_ce_temp,
                               slice_last=False)
        total = cfg.coeff * pos + group + cfg.entcoeff * _zero_if_nan(ent)
        return total, {"train_loss": total, "pos_loss": pos,
                       "group_loss": group, "ent_loss": ent}
    return fn


def _exclusivece_loss(cfg):
    def fn(logits, batch):
        args = (logits, batch["target"], batch["spx"], batch["spmask"])
        group = group_multi_label_ce(*args, nseg=cfg.nseg,
                                     temp=cfg.group_ce_temp,
                                     slice_last=False)
        pos = exclusive_ce(*args)
        total = cfg.coeff * pos + cfg.coeff_gm * group
        return _zero_if_nan(total), {"train_loss": total, "pos_loss": pos,
                                     "group_loss": group}
    return fn


def _lossdecomp_variant(mc_fn):
    def build(cfg):
        def fn(logits, batch):
            args = (logits, batch["target"], batch["spx"], batch["spmask"])
            group = group_multi_label_ce(*args, nseg=cfg.nseg,
                                         temp=cfg.group_ce_temp,
                                         slice_last=False, only_multi=True)
            ce, mc = mc_fn(*args, temp=cfg.multi_ce_temp)
            total = cfg.coeff * ce + cfg.coeff_mc * mc + cfg.coeff_gm * group
            return _zero_if_nan(total), {"train_loss": total, "ce_loss": ce,
                                         "mc_loss": mc, "group_loss": group}
        return fn
    return build


def _pos_plus_group(cfg, pos_fn):
    """coeff * <pos variant> + coeff_gm * full group (mclossablation /
    lscale trainer shape)."""
    def fn(logits, batch):
        args = (logits, batch["target"], batch["spx"], batch["spmask"])
        group = group_multi_label_ce(*args, nseg=cfg.nseg,
                                     temp=cfg.group_ce_temp,
                                     slice_last=False)
        pos = pos_fn(*args, temp=cfg.multi_ce_temp)
        total = cfg.coeff * pos + cfg.coeff_gm * group
        return _zero_if_nan(total), {"train_loss": total, "pos_loss": pos,
                                     "group_loss": group}
    return fn


def _top1plbl_loss(cfg):
    """coeff*MC + group + ramp*TopOnePlbl
    (active_joint_multi_predignore_top1plbl.py:94-127)."""
    def fn(logits, batch, extra):
        args = (logits, batch["target"], batch["spx"], batch["spmask"])
        group = group_multi_label_ce(*args, nseg=cfg.nseg,
                                     temp=cfg.group_ce_temp,
                                     slice_last=False)
        pos = multi_choice_ce(*args, temp=cfg.multi_ce_temp,
                              slice_last=False)
        top1 = top_one_plbl_loss(
            logits, extra["plbl_logits"], batch["target"], batch["spx"],
            batch["spmask"], temp=1.0, within_filtering=cfg.within_filtering,
            threshold=cfg.plbl_th)
        frac = extra["frac"]
        den = 1.0 + jnp.exp(-frac / cfg.lamparam)
        lam = (2.0 / den - 1.0) * cfg.lamscale
        lam = jnp.where(jnp.logical_or(frac > 1.0, not cfg.dorampup), 1.0, lam)
        total = cfg.coeff * pos + group + lam * top1
        return _zero_if_nan(total), {"train_loss": total, "pos_loss": pos,
                                     "group_loss": group, "top1_loss": top1}
    fn.needs_feat = True
    return fn


def _pwce_loss(cfg):
    """active_pwce_multi_predignore.py:157-201: a single
    prototype-weighted CE — candidate-class weights from an eval-mode
    feat_forward's within-spx prototype similarities."""
    from mulactseg_tpu.losses.online import (
        prototype_weight_targets,
        prototype_weighted_ce,
    )

    def fn(logits, batch, extra):
        C = logits.shape[-1]
        feat = extra["feat"]
        plbl_logits = extra["plbl_logits"]
        probs = jax.nn.softmax(plbl_logits.astype(jnp.float32) /
                               cfg.group_ce_temp, axis=-1)

        # --simw_temp_schedule: temp pinned to 1000 for the first 20k
        # iterations (active_pwce_multi_predignore.py:193-198); the step
        # index is recovered from extra['frac'] = step / finetune_itrs
        simw_temp = cfg.simw_temp
        if cfg.simw_temp_schedule:
            step = extra["frac"] * float(cfg.finetune_itrs)
            simw_temp = jnp.where(step < 20000.0, 1000.0, cfg.simw_temp)

        def one(f, p, t, s, m):
            return prototype_weight_targets(
                f.reshape(-1, f.shape[-1]), p.reshape(-1, C), t,
                s.reshape(-1), m.reshape(-1), nseg=cfg.nseg,
                simw_temp=simw_temp)

        w = jax.vmap(one)(feat, probs, batch["target"], batch["spx"],
                          batch["spmask"])
        total = prototype_weighted_ce(logits, w, batch["spmask"],
                                      temp=cfg.group_ce_temp)
        return _zero_if_nan(total), {"train_loss": total}

    fn.needs_feat = True
    return fn


def _wgroup_loss(cfg):
    """active_joint_multi_predignore_wgroup.py:84-122: MC loss + group
    loss weighted by an eval-mode prediction's segment max (uses the
    extra eval forward like the online-plbl family)."""
    def fn(logits, batch, extra):
        group = weighted_group_multi_label_ce(
            logits, extra["plbl_logits"], batch["target"], batch["spx"],
            batch["spmask"], nseg=cfg.nseg, temp=cfg.group_ce_temp)
        pos = multi_choice_ce(logits, batch["target"], batch["spx"],
                              batch["spmask"], temp=cfg.multi_ce_temp,
                              slice_last=False)
        total = cfg.coeff * pos + cfg.coeff_gm * group
        return _zero_if_nan(total), {"train_loss": total, "pos_loss": pos,
                                     "group_loss": group}
    fn.needs_feat = True
    return fn


def _hier_joint_loss(cfg, async_views=False, weight_reduce=None):
    """active_joint_hier_multi(_async)(_async_weight): hierarchy group
    loss + MC loss (coeff * pos + coeff_gm * hier). Async variants expect
    weak-view arrays in the batch (images_weak forwarded by the step when
    present; spx_weak/spx_small_weak/spmask_weak from the loader)."""
    from mulactseg_tpu.losses.hier import (
        async_hier_group_multi_label_ce,
        aug_hier_group_multi_label_ce,
        hier_group_multi_label_ce,
    )

    # --nocropsp swaps in the border-stripping Aug variant
    # (active_joint_hier_multi.py:14-17)
    hier_fn = (aug_hier_group_multi_label_ce if cfg.nocropsp
               else hier_group_multi_label_ce)

    def fn(logits, batch, extra=None):
        pos = multi_choice_ce(logits, batch["target"], batch["spx"],
                              batch["spmask"], temp=cfg.multi_ce_temp)
        if async_views:
            hier = async_hier_group_multi_label_ce(
                logits, batch["logits_weak"], batch["target"],
                batch["spx_weak"], batch["spx_small"],
                batch["spx_small_weak"], batch["spmask"],
                batch["spmask_weak"], nseg=cfg.nseg,
                small_nseg=cfg.small_nseg, temp=cfg.group_ce_temp,
                weight_reduce=weight_reduce)
        else:
            hier = hier_fn(
                logits, batch["target"], batch["spx"], batch["spx_small"],
                batch["spmask"], nseg=cfg.nseg, small_nseg=cfg.small_nseg,
                temp=cfg.group_ce_temp, only_single=cfg.group_only_single,
                gumbel_scale=cfg.gumbel_scale)
        total = cfg.coeff * pos + cfg.coeff_gm * hier
        return _zero_if_nan(total), {"train_loss": total, "pos_loss": pos,
                                     "group_loss": hier}

    if async_views:
        fn.needs_weak_forward = True
    return fn


def _online_plbl_loss(cfg, weighted=False, only_plbl=False, do_mc=False,
                      weight_source="sim"):
    """active_onlineplbl_multi_predignore family
    (active_onlineplbl_multi_predignore.py:143-195): coeff * MC loss +
    lam * LocalProtoCE on online pseudo labels from an eval-mode
    feat_forward, where lam is the sigmoid ramp of step/total only under
    --dorampup (utils/scheduler.py:15-23 returns 1.0 otherwise — the
    reference default). Criteria of this family receive an `extra`
    dict with 'feat', 'plbl_logits' and 'frac' (step/total_itrs).

    weight_source: 'sim' = cosine similarity to the assigned prototype
    (active_onlinesimwplbl_multi_predignore.py:120); 'prob' = the
    eval-mode softmax probability at the pseudo-label class
    (active_onlinewplbl_multi_predignore.py:119). --weight_wo_proto
    forces 1.0 at prototype-source pixels (prob variants only, :120-121);
    --th_wplbl hard-gates pixels by weight > th instead of weighting
    (:137-140 — the reference means over the surviving pixels, folded
    here into the plbl ignore mask)."""
    from mulactseg_tpu.losses.online import local_proto_ce, local_proto_plbl

    def fn(logits, batch, extra):
        B = logits.shape[0]
        C = logits.shape[-1]
        feat = extra["feat"]
        plbl_logits = extra["plbl_logits"]
        probs = jax.nn.softmax(plbl_logits.astype(jnp.float32) /
                               cfg.group_ce_temp, axis=-1)

        def one(f, p, t, s, m):
            return local_proto_plbl(
                f.reshape(-1, f.shape[-1]), p.reshape(-1, C), t,
                s.reshape(-1), m.reshape(-1), nseg=cfg.nseg)

        plbl, sim, is_src = jax.vmap(one)(
            feat, probs, batch["target"], batch["spx"], batch["spmask"])
        plbl = jax.lax.stop_gradient(plbl.reshape(logits.shape[:-1]))
        sim = jax.lax.stop_gradient(sim.reshape(logits.shape[:-1]))
        w = None
        if weighted:
            if weight_source == "prob":
                flat = probs.reshape(plbl.shape + (C,))
                w = jnp.take_along_axis(
                    flat, jnp.clip(plbl, 0, C - 1)[..., None], -1)[..., 0]
                w = jnp.where(plbl != cfg.ignore_idx, w, 0.0)
                if cfg.weight_wo_proto:
                    w = jnp.where(is_src.reshape(plbl.shape), 1.0, w)
            else:
                w = sim
            w = jax.lax.stop_gradient(w)
        if weighted and cfg.th_wplbl is not None:
            # hard gate: pixels at weight <= th leave both the sum and the
            # mean's denominator (reference masked_select over loss != 0)
            plbl = jnp.where(w > cfg.th_wplbl, plbl, cfg.ignore_idx)
            w = None
        proto = local_proto_ce(logits, plbl, temp=cfg.group_ce_temp,
                               weights=w)
        frac = extra["frac"]
        den = 1.0 + jnp.exp(-frac / cfg.lamparam)
        lam = (2.0 / den - 1.0) * cfg.lamscale  # sigmoid_ramp_up
        lam = jnp.where(jnp.logical_or(frac > 1.0,
                                       not cfg.dorampup), 1.0, lam)
        terms = {"local_proto_loss": proto}
        total = lam * proto
        if not only_plbl:
            pos = multi_choice_ce(logits, batch["target"], batch["spx"],
                                  batch["spmask"], temp=cfg.multi_ce_temp,
                                  slice_last=False)
            total = total + cfg.coeff * pos
            terms["pos_loss"] = pos
        if do_mc:
            group = group_multi_label_ce(
                logits, batch["target"], batch["spx"], batch["spmask"],
                nseg=cfg.nseg, temp=cfg.group_ce_temp, slice_last=False,
                only_multi=True)
            total = total + cfg.coeff_gm * group
            terms["group_loss"] = group
        terms["train_loss"] = total
        return _zero_if_nan(total), terms

    fn.needs_feat = True
    return fn


def _mseg_loss(cfg):
    """Mixed-superpixel-scale trainer
    (active_joint_multi_predignore_mseg.py:114-147). The group term's
    temperature is pinned to 1.0 — the reference hardcodes it in
    MultisegGroupMultiLabelCE.__init__ (_mseg.py:13) regardless of
    --group_ce_temp."""
    nseg_list = tuple(sorted(int(n) for n in cfg.nseg_list))
    if not nseg_list:
        raise ValueError("method _mseg requires cfg.nseg_list")

    from mulactseg_tpu.losses.mseg import mseg_joint_loss

    def fn(logits, batch):
        targets = [batch[f"mseg_target_{i}"] for i in range(len(nseg_list))]
        total, aux = mseg_joint_loss(
            logits, targets, batch["mseg_spx"], batch["mseg_spmask"],
            nseg_list=nseg_list, coeff=cfg.coeff,
            multi_ce_temp=cfg.multi_ce_temp, group_ce_temp=1.0)
        return _zero_if_nan(total), aux
    return fn


def _ablation_loss(cfg):
    """--loss_type switch (active_joint_multi_ablation.py:13-24). Note the
    reference file is unimportable for rand/max (it imports
    RandMultiChoiceCE/MaxMultiChoiceCE which utils/loss.py never defines);
    those two are documented reconstructions in losses/partial.py."""
    from mulactseg_tpu.losses.partial import (max_multi_choice_ce,
                                              rand_multi_choice_ce,
                                              rc_multi_choice_ce)

    needs_rng = cfg.loss_type == "rand_multi_ce"

    def fn(logits, batch, extra=None):
        if cfg.loss_type == "rc_multi_ce":
            pos = rc_multi_choice_ce(logits, batch["target"], batch["spx"],
                                     batch["spmask"], temp=cfg.multi_ce_temp)
        elif cfg.loss_type == "max_multi_ce":
            pos = max_multi_choice_ce(logits, batch["target"], batch["spx"],
                                      batch["spmask"], temp=cfg.multi_ce_temp)
        elif cfg.loss_type == "rand_multi_ce":
            pos = rand_multi_choice_ce(logits, batch["target"], batch["spx"],
                                       batch["spmask"], extra["rng"],
                                       temp=cfg.multi_ce_temp)
        else:
            raise NotImplementedError(cfg.loss_type)
        group = group_multi_label_ce(
            logits, batch["target"], batch["spx"], batch["spmask"],
            nseg=cfg.nseg, temp=cfg.group_ce_temp, slice_last=True)
        pos, group = _zero_if_nan(pos), _zero_if_nan(group)
        total = cfg.coeff * pos + group
        return total, {"train_loss": total, "pos_loss": pos,
                       "group_loss": group}

    fn.needs_rng = needs_rng
    return fn


def _sequence_loss(cfg):
    """Sequence training: round k+1 stage-1 training additionally
    supervised by round k's pseudo-label maps
    (active_joint_multi_predignore_sequence.py:24-49; its criterion module
    is absent upstream — see losses/partial.plbl_onehot_ce_multihot_choice
    for the reconstruction). The CE and MC buckets share one pooled
    normalizer: (ce_sum + mc_sum) / (ce_num + mc_num), sequence.py:46-47;
    the count is clamped to >=1 only to avoid 0/0 on all-ignore crops."""
    from mulactseg_tpu.losses.partial import plbl_onehot_ce_multihot_choice

    def fn(logits, batch):
        ce_sum, ce_num, mc_sum, mc_num = plbl_onehot_ce_multihot_choice(
            logits, batch["target"], batch["spx"], batch["spmask"],
            batch["labels"], temp=cfg.multi_ce_temp,
            ignore_idx=cfg.ignore_idx)
        pos = (ce_sum + mc_sum) / jnp.maximum(ce_num + mc_num, 1.0)
        group = group_multi_label_ce(
            logits, batch["target"], batch["spx"], batch["spmask"],
            nseg=cfg.nseg, temp=cfg.group_ce_temp, slice_last=False)
        pos, group = _zero_if_nan(pos), _zero_if_nan(group)
        total = cfg.coeff * pos + group
        return total, {"train_loss": total, "pos_loss": pos,
                       "group_loss": group}
    return fn


CRITERIA: Dict[str, Callable] = {
    "active_joint_multi_predignore_lossdecomp": _lossdecomp_loss,
    "active_joint_multi_lossdecomp": _lossdecomp_loss,
    "active_joint_multi_predignore": lambda cfg: _joint_loss(cfg, slice_last=False),
    "active_joint_multi": lambda cfg: _joint_loss(cfg, slice_last=True),
    "active_joint_multi_predignore_mclossablation2": _mclossablation2_loss,
    "active_predignore": _ce_loss,
    "active": _ce_loss,
    "active_slide": _ce_loss,
    "active_onlineplbl_multi_predignore": _online_plbl_loss,
    "active_onlinewplbl_multi_predignore": lambda cfg: _online_plbl_loss(
        cfg, weighted=True, weight_source="prob"),
    "active_onlinesimwplbl_multi_predignore": lambda cfg: _online_plbl_loss(
        cfg, weighted=True),
    "active_onlinewplblonly_multi_predignore": lambda cfg: _online_plbl_loss(
        cfg, weighted=True, only_plbl=True, weight_source="prob"),
    "active_onlineplbl_multi_predignore_domc": lambda cfg: _online_plbl_loss(
        cfg, do_mc=True),
    "active_onlinesimwplbl_multi_predignore_domc": lambda cfg:
        _online_plbl_loss(cfg, weighted=True, do_mc=True),
    "active_joint_multi_predignore_precise": lambda cfg: _precise_loss(
        cfg, with_group=True),
    "active_joint_multi_predignore_multice_precise": lambda cfg:
        _precise_loss(cfg, with_group=False),
    "active_joint_multi_predignore_multient": _multient_loss,
    "active_joint_multi_predignore_exclusivece": _exclusivece_loss,
    "active_joint_multi_lossdecomp_rc": _lossdecomp_variant(
        onehot_ce_multihot_rc),
    "active_joint_multi_lossdecomp_topone": _lossdecomp_variant(
        onehot_ce_multihot_topone),
    "active_pwce_multi_predignore": lambda cfg: _pwce_loss(cfg),
    "active_joint_multi_predignore_top1plbl": lambda cfg: _top1plbl_loss(cfg),
    "active_joint_multi_predignore_mclossablation": lambda cfg:
        _pos_plus_group(cfg, multi_choice_ce_only_dominant),
    "active_joint_multi_predignore_lscale": lambda cfg:
        _pos_plus_group(cfg, multi_choice_ce_scale),
    "active_joint_multi_predignore_wgroup": _wgroup_loss,
    "active_joint_hier_multi": lambda cfg: _hier_joint_loss(cfg),
    "active_joint_hier_multi_async": lambda cfg: _hier_joint_loss(
        cfg, async_views=True),
    # weight_reduce comes from --weight_reduce (reference default 'max',
    # utils/loss.py:238)
    "active_joint_hier_multi_async_weight": lambda cfg: _hier_joint_loss(
        cfg, async_views=True, weight_reduce=cfg.weight_reduce),
    "active_joint_multi_predignore_mseg": _mseg_loss,
    "active_joint_multi_ablation": _ablation_loss,
    "active_joint_multi_predignore_sequence": _sequence_loss,
    # the reference ships this trainer as an EMPTY file
    # (trainer/active_joint_multi_predignore_logprecision.py, 0 bytes);
    # registered as the predignore criterion for method-string parity
    "active_joint_multi_predignore_logprecision": lambda cfg: _joint_loss(
        cfg, slice_last=False),
}


def get_criterion(cfg):
    if cfg.method not in CRITERIA:
        raise KeyError(
            f"method {cfg.method!r} has no registered criterion; "
            f"available: {sorted(CRITERIA)}")
    return CRITERIA[cfg.method](cfg)


def _device_normalize(x):
    """On-device twin of data/transforms.normalize for uint8 batches
    (cfg.ship_uint8: the loader hands crops through as uint8 — 4x less
    host stacking + transfer — and normalization fuses into the input
    cast here). Same op order as the host arithmetic path."""
    from mulactseg_tpu.data.constants import IMAGENET_MEAN, IMAGENET_STD

    x = x.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(IMAGENET_MEAN, jnp.float32)) / jnp.asarray(
        IMAGENET_STD, jnp.float32)


def _build_loss_fn(model, cfg, criterion):
    needs_feat = getattr(criterion, "needs_feat", False)
    needs_weak = getattr(criterion, "needs_weak_forward", False)
    needs_rng = getattr(criterion, "needs_rng", False)
    # NCHW logits hand-off only on the plain path (feat/rng criteria keep
    # the NHWC public contract)
    wants_nchw = (getattr(criterion, "accepts_nchw", False)
                  and not (needs_feat or needs_rng))
    total_itrs = float(cfg.finetune_itrs)

    def loss_fn(params, batch_stats, batch, rng, step_no):
        if batch["images"].dtype == jnp.uint8:
            batch = dict(batch)
            batch["images"] = _device_normalize(batch["images"])
            if ("images_weak" in batch
                    and batch["images_weak"].dtype == jnp.uint8):
                batch["images_weak"] = _device_normalize(
                    batch["images_weak"])
        from mulactseg_tpu.models.layers import bn_frozen

        with bn_frozen(cfg.freeze_bn):
            # freeze_bn: BN runs on running stats (and leaves them
            # unchanged) while dropout stays live — the reference's
            # freeze_bn() over a net in train mode (active_voc.py:74-76)
            out, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["images"], train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
                **({"nchw_logits": True} if wants_nchw else {}))
        if needs_weak:
            # weak-view eval-mode forward for the async hier criteria
            batch = dict(batch)
            batch["logits_weak"] = jax.lax.stop_gradient(model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["images_weak"], train=False))
        if needs_feat:
            # eval-mode second forward for online pseudo labels
            # (active_onlineplbl_multi_predignore.py:172-176)
            feat, plbl_logits = model.apply(
                {"params": jax.lax.stop_gradient(params),
                 "batch_stats": batch_stats},
                batch["images"], train=False, return_feat=True)
            extra = {"feat": jax.lax.stop_gradient(feat),
                     "plbl_logits": jax.lax.stop_gradient(plbl_logits),
                     "frac": step_no.astype(jnp.float32) / total_itrs}
            total, aux = criterion(out, batch, extra)
        elif needs_rng:
            # criteria that sample (rand_multi_ce ablation): a fold of the
            # step rng, independent of the dropout stream
            total, aux = criterion(out, batch,
                                   {"rng": jax.random.fold_in(rng, 1)})
        else:
            total, aux = (criterion(out, batch, nchw=True) if wants_nchw
                          else criterion(out, batch))
        return total, (aux, mutated["batch_stats"])

    return loss_fn


def make_train_step(model, cfg, donate: bool = True):
    loss_fn = _build_loss_fn(model, cfg, get_criterion(cfg))

    def step(state, batch, rng):
        (_, (aux, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   rng, state.step)
        new_state = state.apply_gradients(grads, new_bs)
        return new_state, aux

    donate_args = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_args)


def make_train_step_scan(model, cfg, steps_per_dispatch: int,
                         donate: bool = True, auto_layout: bool = False):
    """K training steps per dispatch as a device-side lax.scan.

    The reference dispatches one GPU step per Python iteration
    (trainer/active.py:73-104); on TPU the host-device round trip per
    step would dominate, so the loop lives on device: the host ships a
    super-batch with a leading K dimension and gets back the state after
    K optimizer updates plus the per-step loss trace.
    """
    loss_fn = _build_loss_fn(model, cfg, get_criterion(cfg))

    def one_step(state, xs):
        batch, rng = xs
        (_, (aux, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   rng, state.step)
        return state.apply_gradients(grads, new_bs), aux

    def run(state, super_batch, rng):
        rngs = jax.random.split(rng, steps_per_dispatch)
        state, auxs = jax.lax.scan(one_step, state, (super_batch, rngs))
        return state, auxs

    donate_args = (0,) if donate else ()
    if auto_layout:
        # let XLA choose the ENTRY layouts (jax.experimental.layout AUTO):
        # the caller then device_puts state/super-batch directly into the
        # layout the compiled loop wants (compiled.input_formats), instead
        # of the loop re-laying-out every sliced xs slab per scan step
        from jax.experimental.layout import Format, Layout

        return jax.jit(run, donate_argnums=donate_args,
                       in_shardings=Format(Layout.AUTO),
                       out_shardings=Format(Layout.AUTO))
    return jax.jit(run, donate_argnums=donate_args)


def make_eval_step(model):
    @jax.jit
    def step(params, batch_stats, images):
        if images.dtype == jnp.uint8:  # cfg.ship_uint8 pool batches
            images = _device_normalize(images)
        return model.apply({"params": params, "batch_stats": batch_stats},
                           images, train=False)
    return step


def make_feat_eval_step(model):
    @jax.jit
    def step(params, batch_stats, images):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           images, train=False, return_feat=True)
    return step
