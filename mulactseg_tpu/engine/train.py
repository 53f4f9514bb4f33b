"""Jitted training steps for every trainer family.

The reference selects trainers by module name via importlib
(train_AL.py:33); here the same method strings key a criterion registry,
and each method becomes one pjit-compiled step: forward (BN in train
mode, batch-synced automatically under data-parallel sharding), partial-
label loss, backward, AdamW+poly update — no per-image Python loops, no
host sync. NaN guards mirror trainer/active_joint_multi.py:17-29
(zero_if_nan per component).

Method coverage (SURVEY.md section 2e):
  active_joint_multi_predignore_lossdecomp — shipped Cityscapes stage-1
  active_joint_multi_lossdecomp            — shipped VOC stage-1
  active_joint_multi(_predignore)          — joint group+MC trainers
  active_joint_multi_predignore_mclossablation2 — group(onlymulti)+dom CE
  active_predignore / active               — stage-2 / plain CE trainers
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
    onehot_ce_multihot_choice,
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
    def fn(logits, batch):
        total, aux = lossdecomp(
            logits, batch["target"], batch["spx"], batch["spmask"],
            nseg=cfg.nseg, coeff=cfg.coeff, coeff_mc=cfg.coeff_mc,
            coeff_gm=cfg.coeff_gm, multi_ce_temp=cfg.multi_ce_temp,
            group_ce_temp=cfg.group_ce_temp)
        return _zero_if_nan(total), aux
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


CRITERIA: Dict[str, Callable] = {
    "active_joint_multi_predignore_lossdecomp": _lossdecomp_loss,
    "active_joint_multi_lossdecomp": _lossdecomp_loss,
    "active_joint_multi_predignore": lambda cfg: _joint_loss(cfg, slice_last=False),
    "active_joint_multi": lambda cfg: _joint_loss(cfg, slice_last=True),
    "active_joint_multi_predignore_mclossablation2": _mclossablation2_loss,
    "active_predignore": _ce_loss,
    "active": _ce_loss,
}


def get_criterion(cfg):
    if cfg.method not in CRITERIA:
        raise KeyError(
            f"method {cfg.method!r} has no registered criterion; "
            f"available: {sorted(CRITERIA)}")
    return CRITERIA[cfg.method](cfg)


def make_train_step(model, cfg, donate: bool = True):
    criterion = get_criterion(cfg)

    def loss_fn(params, batch_stats, batch, rng):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["images"], train=True, mutable=["batch_stats"],
            rngs={"dropout": rng})
        total, aux = criterion(out, batch)
        return total, (aux, mutated["batch_stats"])

    def step(state, batch, rng):
        (_, (aux, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch, rng)
        new_state = state.apply_gradients(grads, new_bs)
        return new_state, aux

    donate_args = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_args)


def make_train_step_scan(model, cfg, steps_per_dispatch: int,
                         donate: bool = True):
    """K training steps per dispatch as a device-side lax.scan.

    The reference dispatches one GPU step per Python iteration
    (trainer/active.py:73-104); on TPU the host-device round trip per
    step would dominate, so the loop lives on device: the host ships a
    super-batch with a leading K dimension and gets back the state after
    K optimizer updates plus the per-step loss trace.
    """
    criterion = get_criterion(cfg)

    def loss_fn(params, batch_stats, batch, rng):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["images"], train=True, mutable=["batch_stats"],
            rngs={"dropout": rng})
        total, aux = criterion(out, batch)
        return total, (aux, mutated["batch_stats"])

    def one_step(state, xs):
        batch, rng = xs
        (_, (aux, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch, rng)
        return state.apply_gradients(grads, new_bs), aux

    def run(state, super_batch, rng):
        rngs = jax.random.split(rng, steps_per_dispatch)
        state, auxs = jax.lax.scan(one_step, state, (super_batch, rngs))
        return state, auxs

    donate_args = (0,) if donate else ()
    return jax.jit(run, donate_argnums=donate_args)


def make_eval_step(model):
    @jax.jit
    def step(params, batch_stats, images):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           images, train=False)
    return step


def make_feat_eval_step(model):
    @jax.jit
    def step(params, batch_stats, images):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           images, train=False, return_feat=True)
    return step
