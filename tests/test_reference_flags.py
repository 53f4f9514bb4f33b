"""Behavior of the reference's consumed-but-previously-missing flags:
freeze_bn, load_optim, adaptive_train_lr, nocropsp, simw_temp_schedule,
th_wplbl / weight_wo_proto / prob-vs-sim wplbl weights, weight_reduce.

Reference semantics: trainer/active.py:30-33 (adaptive lr),
trainer/active_voc.py:74-76 (freeze_bn), trainer/base.py:288-295
(load_optimizer), active_joint_hier_multi.py:14-17 (nocropsp),
active_pwce_multi_predignore.py:193-198 (simw schedule),
active_onlinewplbl_multi_predignore.py:119-140 (wplbl weights/gate)."""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mulactseg_tpu.config import Config
from mulactseg_tpu.engine.state import make_optimizer
from mulactseg_tpu.engine.train import get_criterion
from mulactseg_tpu.models import layers


class _BNNet(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return layers.batch_norm(train)(x)


def test_bn_frozen_context():
    net = _BNNet()
    x = jnp.asarray(np.random.RandomState(0).randn(4, 8, 8, 3), jnp.float32)
    v = net.init(jax.random.PRNGKey(0), x, train=False)
    # warm the running stats away from init so frozen != train-mode output
    _, upd = net.apply(v, x + 2.0, train=True, mutable=["batch_stats"])
    v = {"params": v.get("params", {}), "batch_stats": upd["batch_stats"]}

    y_train, mut = net.apply(v, x, train=True, mutable=["batch_stats"])
    with layers.bn_frozen(True):
        y_frozen, mut_f = net.apply(v, x, train=True, mutable=["batch_stats"])
    y_eval = net.apply(v, x, train=False)

    # frozen train == eval (running stats), not batch stats
    np.testing.assert_allclose(np.asarray(y_frozen), np.asarray(y_eval),
                               rtol=1e-6)
    assert not np.allclose(np.asarray(y_frozen), np.asarray(y_train))
    # and the running stats are untouched
    np.testing.assert_array_equal(
        np.asarray(mut_f["batch_stats"]["FastBatchNorm_0"]["mean"]),
        np.asarray(v["batch_stats"]["FastBatchNorm_0"]["mean"]))
    # context restored
    y_after, _ = net.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_after), np.asarray(y_train),
                               rtol=1e-6)


def test_adaptive_train_lr_scales_updates():
    cfg = Config(train_lr=1e-2, scheduler="none", optimizer="adamw",
                 weight_decay=0.0)
    params = {"backbone": {"w": jnp.ones((4,))},
              "classifier": {"w": jnp.ones((4,))}}
    grads = jax.tree_util.tree_map(lambda p: jnp.full_like(p, 0.5), params)

    def step_delta(mult):
        tx = make_optimizer(cfg, total_itrs=10, lr_mult=mult)
        upd, _ = tx.update(grads, tx.init(params), params)
        return upd["backbone"]["w"][0]

    d1, d3 = step_delta(1.0), step_delta(3.0)
    assert np.isclose(float(d3) / float(d1), 3.0, rtol=1e-5)


def test_freeze_bn_through_train_step(tmp_path):
    """cfg.freeze_bn wired through _build_loss_fn: a real optimizer step
    must leave every BN running stat untouched while params move."""
    from mulactseg_tpu.data.synthetic import SyntheticRegionDataset
    from mulactseg_tpu.engine.rounds import ALTrainer

    cfg = Config(num_classes=5, nseg=16, crop_size=(24, 24),
                 train_batch_size=2, model="deeplabv3plus_mobilenet",
                 dtype="float32", loader="synthetic", n_devices=1,
                 method="active_joint_multi_predignore_lossdecomp",
                 freeze_bn=True, model_save_dir=str(tmp_path))
    tr = ALTrainer(cfg, 1)
    ds = SyntheticRegionDataset(n_images=2, H=24, W=24, num_classes=5,
                                nseg=16, split="active-label", seed=0)
    from mulactseg_tpu.data.loader import collate

    batch = collate([ds[0], ds[1]])
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if k != "fnames"}
    bs_before = jax.device_get(tr.state.batch_stats)
    p_before = jax.device_get(
        jax.tree_util.tree_leaves(tr.state.params)[0])
    tr.state, _ = tr.train_step(tr.state, batch, jax.random.PRNGKey(0))
    bs_after = jax.device_get(tr.state.batch_stats)
    for a, b in zip(jax.tree_util.tree_leaves(bs_before),
                    jax.tree_util.tree_leaves(bs_after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    p_after = jax.device_get(jax.tree_util.tree_leaves(tr.state.params)[0])
    assert not np.allclose(np.asarray(p_before), np.asarray(p_after))


def test_load_optim_gate(tmp_path):
    from mulactseg_tpu.engine.rounds import ALTrainer

    cfg = Config(num_classes=5, nseg=16, crop_size=(24, 24),
                 train_batch_size=2, model="deeplabv3plus_mobilenet",
                 dtype="float32", loader="synthetic", n_devices=1,
                 model_save_dir=str(tmp_path))
    tr = ALTrainer(cfg, 1)
    tr.state = tr.state.replace(step=jnp.asarray(7, jnp.int32))
    tr.save(str(tmp_path / "ckpt"))

    fresh = ALTrainer(cfg, 1, rng=jax.random.PRNGKey(1))
    fresh.load(str(tmp_path / "ckpt"), strip_classifier=False,
               load_optim=False)
    assert int(fresh.state.step) == 0  # fresh optimizer/step
    np.testing.assert_array_equal(  # but params restored
        np.asarray(jax.tree_util.tree_leaves(fresh.state.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(tr.state.params)[0]))
    fresh.load(str(tmp_path / "ckpt"), strip_classifier=False,
               load_optim=True)
    assert int(fresh.state.step) == 7


def test_auto_name_and_duplication_bump(tmp_path):
    """gen_save_name + avoid_duplication (utils/common.py:118-140)."""
    import os

    base = str(tmp_path / "run")
    cfg = Config(auto_name=True, model_save_dir=base, nseg=2048,
                 active_selection_size=100_000, finetune_itrs=80_000,
                 active_method="my_bvsb_predclsbal_pwr_banignore",
                 method="active_joint_multi_predignore_lossdecomp",
                 coeff=16.0, train_lr=2e-5).derive_paths()
    assert cfg.model_save_dir == (
        base + "_my_bvsb_predclsbal_pwr_banignore_sp2048_nlbl100.0k"
        "_iter80.0k_method-active_joint_multi_predignore_lossdecomp-"
        "_coeff16.0_ignFalse_lr2e-05_")
    os.makedirs(cfg.model_save_dir)
    cfg2 = Config(auto_name=True, model_save_dir=base, nseg=2048,
                  active_selection_size=100_000, finetune_itrs=80_000,
                  active_method="my_bvsb_predclsbal_pwr_banignore",
                  method="active_joint_multi_predignore_lossdecomp",
                  coeff=16.0, train_lr=2e-5).derive_paths()
    assert cfg2.model_save_dir == cfg.model_save_dir + "_1"
    # stage2 never renames (utils/common.py:155-157)
    cfg3 = Config(auto_name=True, stage2=True,
                  model_save_dir=base).derive_paths()
    assert cfg3.model_save_dir == base


def _hier_batch(rng, B=1, H=8, W=8, C=5, S=9, S_small=16):
    # hier methods: C-channel logits, (S, C+1) multi-hot (last sliced off)
    logits = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    spx = np.repeat(np.repeat(np.arange(S).reshape(3, 3), 3, 0), 3, 1)
    spx = jnp.asarray(np.tile(spx[:H, :W], (B, 1, 1)), jnp.int32)
    small = np.repeat(np.repeat(np.arange(S_small).reshape(4, 4), 2, 0), 2, 1)
    small = jnp.asarray(np.tile(small[:H, :W], (B, 1, 1)), jnp.int32)
    trg = (rng.rand(B, S, C + 1) < 0.5).astype(np.float32)
    trg[..., -1] = 0.0
    return {"target": jnp.asarray(trg), "spx": spx, "spx_small": small,
            "spmask": jnp.ones((B, H, W), bool)}, logits


def test_nocropsp_selects_aug_variant():
    rng = np.random.RandomState(0)
    batch, logits = _hier_batch(rng)
    base = Config(num_classes=5, nseg=9, small_nseg=16,
                  method="active_joint_hier_multi")
    plain = get_criterion(base)(logits, batch)[0]
    aug = get_criterion(dataclasses.replace(base, nocropsp=True))(
        logits, batch)[0]
    # every 3x3-grid superpixel touches the border -> Aug strips all labels
    assert not np.isclose(float(plain), float(aug))


def test_weight_reduce_changes_async_weight_loss():
    rng = np.random.RandomState(1)
    batch, logits = _hier_batch(rng)
    batch = dict(batch)
    batch["logits_weak"] = jnp.asarray(rng.randn(*logits.shape), jnp.float32)
    batch["spx_weak"] = batch["spx"]
    batch["spx_small_weak"] = batch["spx_small"]
    batch["spmask_weak"] = batch["spmask"]
    base = Config(num_classes=5, nseg=9, small_nseg=16,
                  method="active_joint_hier_multi_async_weight")
    lmax = get_criterion(base)(logits, batch)[0]
    lmean = get_criterion(dataclasses.replace(base, weight_reduce="mean"))(
        logits, batch)[0]
    assert np.isfinite(float(lmax)) and np.isfinite(float(lmean))
    assert not np.isclose(float(lmax), float(lmean))


def _wplbl_setup(method, **cfg_kw):
    rng = np.random.RandomState(2)
    B, H, W, C, S, Ch = 1, 6, 6, 4, 4, 8
    cfg_kw.setdefault("finetune_itrs", 100)
    cfg = Config(num_classes=C, nseg=S, method=method, **cfg_kw)
    logits = jnp.asarray(rng.randn(B, H, W, C + 1), jnp.float32)
    feat = rng.randn(B, H, W, Ch).astype(np.float32)
    feat /= np.linalg.norm(feat, axis=-1, keepdims=True)
    plbl_logits = jnp.asarray(rng.randn(B, H, W, C + 1), jnp.float32)
    spx = np.repeat(np.repeat(np.arange(S).reshape(2, 2), 3, 0), 3, 1)
    trg = np.zeros((B, S, C + 1), np.float32)
    trg[:, :, :2] = 1.0  # every spx multi-hot {0,1}
    batch = {"target": jnp.asarray(trg),
             "spx": jnp.asarray(spx[None], jnp.int32),
             "spmask": jnp.ones((B, H, W), bool)}
    extra = {"feat": jnp.asarray(feat), "plbl_logits": plbl_logits,
             "frac": jnp.asarray(0.5, jnp.float32)}
    return cfg, logits, batch, extra


def test_wplbl_prob_vs_sim_weight_source():
    cfg_p, logits, batch, extra = _wplbl_setup(
        "active_onlinewplbl_multi_predignore", dorampup=False)
    cfg_s = dataclasses.replace(
        cfg_p, method="active_onlinesimwplbl_multi_predignore")
    lp = get_criterion(cfg_p)(logits, batch, extra)[0]
    ls = get_criterion(cfg_s)(logits, batch, extra)[0]
    assert np.isfinite(float(lp)) and np.isfinite(float(ls))
    # prob weights differ from similarity weights on a generic fixture
    assert not np.isclose(float(lp), float(ls))


def test_th_wplbl_gates_and_renormalizes():
    cfg, logits, batch, extra = _wplbl_setup(
        "active_onlinewplbl_multi_predignore", dorampup=False)
    l_all = get_criterion(cfg)(logits, batch, extra)[0]
    # th above every prob -> every pixel gated out -> proto term 0; the MC
    # pos term remains, so compare against the explicitly-pruned criterion
    cfg_hi = dataclasses.replace(cfg, th_wplbl=1.1)
    l_gated = get_criterion(cfg_hi)(logits, batch, extra)[0]
    assert np.isfinite(float(l_gated))
    assert not np.isclose(float(l_all), float(l_gated))
    # a permissive threshold keeps pixels but switches to the unweighted
    # mean over survivors (reference :140) — differs from weighting
    cfg_lo = dataclasses.replace(cfg, th_wplbl=0.0)
    l_lo = get_criterion(cfg_lo)(logits, batch, extra)[0]
    assert not np.isclose(float(l_lo), float(l_all))


def test_weight_wo_proto_bumps_proto_pixels():
    cfg, logits, batch, extra = _wplbl_setup(
        "active_onlinewplbl_multi_predignore", dorampup=False)
    l0 = get_criterion(cfg)(logits, batch, extra)[0]
    l1 = get_criterion(dataclasses.replace(cfg, weight_wo_proto=True))(
        logits, batch, extra)[0]
    assert not np.isclose(float(l0), float(l1))


def test_simw_temp_schedule():
    cfg, logits, batch, extra = _wplbl_setup(
        "active_pwce_multi_predignore", finetune_itrs=100_000,
        simw_temp=0.1, simw_temp_schedule=True)
    crit = get_criterion(cfg)
    early = crit(logits, batch, dict(extra, frac=jnp.asarray(0.1)))[0]
    late = crit(logits, batch, dict(extra, frac=jnp.asarray(0.5)))[0]
    # temp 1000 (early, flat softmax) vs 0.1 (late, peaked)
    assert not np.isclose(float(early), float(late))
    # without the schedule the same two fracs give identical losses
    cfg_off = dataclasses.replace(cfg, simw_temp_schedule=False)
    crit_off = get_criterion(cfg_off)
    e2 = crit_off(logits, batch, dict(extra, frac=jnp.asarray(0.1)))[0]
    l2 = crit_off(logits, batch, dict(extra, frac=jnp.asarray(0.5)))[0]
    np.testing.assert_allclose(float(e2), float(l2), rtol=1e-6)


def test_wplbl_prob_weights_match_bruteforce():
    """The prob-source weighted proto CE against a numpy transcription of
    active_onlinewplbl_multi_predignore.py:119,127-143 (weight = softmax
    prob at the plbl class; mean of weight*ce over labeled pixels)."""
    from mulactseg_tpu.losses.online import local_proto_plbl

    cfg, logits, batch, extra = _wplbl_setup(
        "active_onlinewplblonly_multi_predignore", dorampup=False)
    C = cfg.num_classes
    probs = jax.nn.softmax(extra["plbl_logits"].astype(jnp.float32) /
                           cfg.group_ce_temp, axis=-1)
    plbl, _, _ = local_proto_plbl(
        jnp.asarray(extra["feat"]).reshape(-1, extra["feat"].shape[-1]),
        probs.reshape(-1, C + 1), batch["target"][0],
        batch["spx"].reshape(-1), batch["spmask"].reshape(-1), nseg=cfg.nseg)
    plbl = np.asarray(plbl)
    lg = np.asarray(logits, np.float64).reshape(-1, C + 1) / cfg.group_ce_temp
    logp = lg - np.log(np.exp(lg - lg.max(-1, keepdims=True)).sum(-1,
                       keepdims=True)) - lg.max(-1, keepdims=True)
    pr = np.asarray(probs, np.float64).reshape(-1, C + 1)
    valid = plbl != 255
    w = pr[np.arange(len(plbl)), np.clip(plbl, 0, C)]
    ce = -logp[np.arange(len(plbl)), np.clip(plbl, 0, C)]
    want = (w[valid] * ce[valid]).sum() / valid.sum()

    got = get_criterion(cfg)(logits, batch, extra)[0]
    # only_plbl: criterion = lam * proto term; dorampup False, frac .5 -> 1
    np.testing.assert_allclose(float(got), want, rtol=1e-5)

    # th_wplbl gate: unweighted mean over survivors (w > th), the
    # reference's masked_select-over-nonzero mean (:137-143)
    th = float(np.median(w[valid]))
    keep = valid & (w > th)
    want_gate = ce[keep].sum() / keep.sum()
    got_gate = get_criterion(dataclasses.replace(cfg, th_wplbl=th))(
        logits, batch, extra)[0]
    np.testing.assert_allclose(float(got_gate), want_gate, rtol=1e-5)
