"""Round-LEVEL parity: one complete synthetic AL round driven through the
PRODUCT path vs torch/numpy transcriptions of the reference at every
stage boundary. This is the closest achievable stand-in for the
"per-round mIoU within 0.2 of the reference" north star while real
Cityscapes/VOC data is environment-blocked (BASELINE.md).

The round follows /root/reference/train_AL.py:37-82:
  A. selection   my_bvsb_predclsbal_pwr_banignore two-pass scoring
                 (active_selection/my_bvsb_predclsbal_pwr_banignore.py:
                 23-97) + expand_training_set budget walk
                 (dataloader/region_active_dataset.py:16-72)
  B. stage-1     lossdecomp partial-label training
                 (trainer/active_joint_multi_predignore_lossdecomp.py)
  C. plbl        cosine-prototype generation with propagation
                 (trainer/eval_save_cosplbl_prop_includeonehot.py:121-313)
  D. stage-2     plain CE retrain on the plbl maps (trainer/active.py:92
                 with MyCrossEntropyLoss) + val mIoU

Weight synchronization makes every comparison well-posed (two sides
trained independently would drift and flip score ties, making outcome
diffs uninterpretable):
  A: both sides score the pool with IDENTICAL weights (torch init
     imported into flax via models/torch_import) -> score tensors must
     agree to float noise and the selected (image, spx) sets must match
     exactly up to documented cutoff ties.
  B: both sides take the SAME recorded batch stream from the product
     loader -> per-step loss trajectories tracked (AdamW sign-descent
     bound, see BASELINE.md trajectory rows).
  C: the torch twin's post-stage-1 weights are imported into flax; both
     generate pseudo-labels for the labeled set -> per-pixel agreement.
  D: both sides re-start from the ORIGINAL init and train CE on the
     PRODUCT's plbl maps with the same batch stream -> final synthetic
     val mIoU compared.

Run: python tools_dev/round_parity.py [--steps1 N] [--steps2 N]
tests/test_round_parity.py asserts the same bounds at small step counts.
"""

import argparse
import copy
import sys

import numpy as np


def _force_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------------------
# torch transcriptions (reference semantics, no torch_scatter dependency)
# ---------------------------------------------------------------------------


def _region_mean(vals, spx, nseg):
    """torch_scatter.scatter(reduce='mean', dim_size=nseg) over dim 1:
    absent superpixels get 0 (my_bvsb.py:74)."""
    import torch

    B = vals.shape[0]
    s = torch.zeros(B, nseg, dtype=vals.dtype)
    c = torch.zeros(B, nseg, dtype=vals.dtype)
    s.scatter_add_(1, spx, vals)
    c.scatter_add_(1, spx, torch.ones_like(vals))
    return torch.where(c > 0, s / c.clamp(min=1), torch.zeros_like(s))


def torch_selector_scores(tm, batches, nseg, num_class, ce_temp, coeff):
    """Two-pass my_bvsb_predclsbal_pwr_banignore.calculate_scores
    (my_bvsb_predclsbal_pwr_banignore.py:23-97): pass 1 accumulates the
    batch-mean softmax at ce_temp and divides by the number of BATCHES;
    cls_weight = (k*p+1)^-2; pass 2 scores regions by the region-mean of
    pixel BvSB (softmax_bvsb at ce_temp, my_bvsb.py:19-27) weighted by the
    top-1 class weight, then zeroes regions whose top-1-vote dominant
    class is the undefined channel. Returns the (N, nseg) score tensor."""
    import torch
    import torch.nn.functional as F

    was_training = tm.training
    tm.eval()  # model.eval() in the reference sweep (line 24) — BN uses
    # running stats and does NOT update them during scoring
    with torch.no_grad():
        cum = torch.zeros(num_class + 1)
        for x, _ in batches:
            _, preds = tm(x)
            prob = F.softmax(preds / ce_temp, dim=1)
            cum += prob.mean(dim=(0, 2, 3))
        cum = cum / len(batches)
        cls_weight = (coeff * cum + 1.0) ** -2

        unc, votes = [], []
        for x, spx in batches:
            _, preds = tm(x)
            prob = F.softmax(preds / ce_temp, dim=1)
            top2v, top2i = torch.topk(prob, 2, dim=1)
            bvsb = top2v[:, 1] / top2v[:, 0] + 1e-8
            top1 = top2i[:, 0]
            B = top1.shape[0]
            w = cls_weight[top1.reshape(-1)].view_as(top1)
            weighted = (bvsb * w).view(B, -1)
            sp = spx.view(B, -1)
            unc.append(_region_mean(weighted, sp, nseg))
            oh = F.one_hot(top1.view(B, -1), num_class + 1).float()
            v = torch.zeros(B, nseg, num_class + 1)
            v.scatter_add_(1, sp[..., None].expand_as(oh), oh)
            votes.append(v)
        unc = torch.cat(unc, 0).reshape(-1)
        votes = torch.cat(votes, 0).reshape(-1, num_class + 1)
        dominant = votes.argmax(dim=1)
        unc[dominant == num_class] = 0.0
        if was_training:
            tm.train()
        return unc.view(-1, nseg).numpy()


def torch_expand(scores_tensor, pool_im_idx, pool_suppix, label_multi_hot,
                 id_to_index, budget, fair_counting=True):
    """expand_training_set transcription
    (region_active_dataset.py:16-72): walk the desc-sorted
    (score, path, spx_id) list moving ids pool -> labeled; fair counting
    charges the multi-hot class count; stop AFTER the region that pushes
    selected_count past the budget. Returns the selected (lbl_path,
    spx_id) set and the ordered list."""
    scores = []
    for kdx, key in enumerate(pool_im_idx):
        path = ",".join(key)
        for i in pool_suppix[key[2]]:
            scores.append((float(scores_tensor[kdx][i]), path, int(i)))
    ordered = sorted(scores, reverse=True)
    selected_count = 0
    chosen = []
    for score, path, sid in ordered:
        paths = path.split(",")
        chosen.append((paths[1], sid, score))
        if fair_counting:
            idx = id_to_index[paths[1].split(".")[0]]
            selected_count += int(label_multi_hot[idx, sid].sum())
        else:
            selected_count += 1
        if selected_count > budget:
            break
    return chosen


def torch_stage2_step(tm, opt, x, labels, ce_temp):
    """Stage-2 criterion: MyCrossEntropyLoss == CE on logits/temp with
    ignore_index (utils/loss.py MyCrossEntropyLoss via
    trainer/base.py:84, driven by trainer/active.py:92)."""
    import torch
    import torch.nn.functional as F

    opt.zero_grad()
    _, logits = tm(x)
    loss = F.cross_entropy(logits / ce_temp, labels, ignore_index=255)
    loss.backward()
    opt.step()
    return float(loss)


# ---------------------------------------------------------------------------
# the harness
# ---------------------------------------------------------------------------


def run(steps1=20, steps2=20, seed=0, n_pool=6, budget=40, lr=1e-4,
        verbose=True):
    import torch
    import torch.nn.functional as F

    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp

    from tests.test_full_model_parity import TorchDeepLab
    from tests.test_plbl import ref_cosplbl
    from mulactseg_tpu.acquisition import get_selector
    from mulactseg_tpu.active import RegionActiveSet
    from mulactseg_tpu.config import Config
    from mulactseg_tpu.data.loader import DataProvider
    from mulactseg_tpu.data.synthetic import SyntheticRegionDataset
    from mulactseg_tpu.engine.state import create_train_state
    from mulactseg_tpu.engine.train import get_criterion
    from mulactseg_tpu.models.deeplab import DeepLabHeadV3Plus, DeepLabV3
    from mulactseg_tpu.models.resnet import ResNet
    from mulactseg_tpu.models.torch_import import torch_state_dict_to_variables
    from mulactseg_tpu.plbl.generator import PseudoLabelGenerator
    from mulactseg_tpu.utils.metrics import MeanIoU

    torch.manual_seed(seed)
    torch.set_num_threads(1)
    report = {}

    # -- fixture ------------------------------------------------------------
    # C real classes + the undefined channel (predignore); 64x64 images,
    # grid superpixels
    # lr default 1e-4: at 1e-3 the first steps move the random-init model
    # so violently (loss 13.9 -> 5.8 in one step) that AdamW sign-descent
    # noise decorrelates the two sides within 2 steps even though step-0
    # losses agree to 2e-5 — measured 2026-08-19; the recipe lr is 2e-5
    Creal, S, HH, B = 6, 16, 64, 2
    wd, cls_scale = 5e-4, 10.0
    coeff, coeff_mc, coeff_gm = 16.0, 8.0, 1.0
    t_mc = t_gm = t_ce = 0.1
    import tempfile

    tmpdir = tempfile.mkdtemp(prefix="round_parity_")
    cfg = Config(num_classes=Creal, nseg=S, crop_size=(HH, HH),
                 train_batch_size=B, val_batch_size=2,
                 method="active_joint_multi_predignore_lossdecomp",
                 active_method="my_bvsb_predclsbal_pwr_banignore",
                 or_labeling=True, fair_counting=True,
                 train_lr=lr, cls_lr_scale=cls_scale, weight_decay=wd,
                 coeff=coeff, coeff_mc=coeff_mc, coeff_gm=coeff_gm,
                 multi_ce_temp=t_mc, group_ce_temp=t_gm, ce_temp=t_ce,
                 cls_weight_coeff=6.0, finetune_itrs=max(steps1, steps2),
                 dtype="float32", loader="synthetic", seed=seed,
                 num_workers=0, val_num_workers=0, save_scores=False,
                 model_save_dir=tmpdir)
    mk = lambda split, n: SyntheticRegionDataset(
        n_images=n, H=HH, W=HH, num_classes=Creal, nseg=S, split=split,
        seed=1)
    pool = mk("active-ulabel", n_pool)
    label = mk("active-label", n_pool)
    label.suppix = {}
    label.im_idx = []
    val = mk("val", 3)
    active_set = RegionActiveSet(cfg, pool, label)
    active_set.selection_iter = 1

    # -- identical init on both sides ---------------------------------------
    Cm = Creal + 1  # model channels incl. undefined
    tm = TorchDeepLab(num_classes=Cm)
    tm.train()
    for m in tm.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    import flax.linen as fnn

    fnn.Dropout.__call__ = lambda self, x, **kw: x  # harness-only patch

    def export_sd():
        # .numpy() would share torch memory (see trajectory_parity)
        return {k: v.detach().numpy().copy()
                for k, v in tm.state_dict().items()}

    def make_flax():
        return DeepLabV3(
            backbone=ResNet(layers=(2, 2, 2, 2), deep_stem=True,
                            stem_width=16,
                            replace_stride_with_dilation=(False, False, True),
                            stage_planes=(16, 32, 64, 128)),
            classifier=DeepLabHeadV3Plus(Cm, (6, 12, 18), variant="wn",
                                         low_channels=12, mid_channels=64))

    sd0 = export_sd()
    variables0 = torch_state_dict_to_variables(sd0, wn_head=True)
    fm = make_flax()

    # ======================================================================
    # A. selection parity at identical weights
    # ======================================================================
    class _Shim:
        """Duck-typed trainer: the selector only uses predict_logits."""

        def __init__(self, variables):
            self._fn = jax.jit(
                lambda x: fm.apply(variables, x, train=False))

        def predict_logits(self, images):
            return self._fn(jnp.asarray(images))

    pool_im_idx0 = [list(k) for k in pool.im_idx]
    pool_suppix0 = {k: list(v) for k, v in pool.suppix.items()}

    selector = get_selector(cfg.active_method, cfg)
    prod_scores = selector.calculate_scores(_Shim(variables0), pool)
    prod_chosen_n, _ = active_set.expand_training_set(
        sorted(prod_scores, reverse=True), budget, cfg.active_method)
    prod_selected = {(key[1], int(v)) for key in label.im_idx
                     for v in label.suppix[key[2]]}

    # torch twin on the SAME pool batches (DataProvider is deterministic
    # with shuffle=False)
    tl = DataProvider(pool, cfg.val_batch_size, shuffle=False,
                      drop_last=False, infinite=False, num_workers=0)
    tbatches = [(torch.from_numpy(
        np.asarray(b["images"]).transpose(0, 3, 1, 2)),
        torch.from_numpy(np.asarray(b["spx"]).astype(np.int64)))
        for b in tl]
    ref_tensor = torch_selector_scores(tm, tbatches, S, Creal, t_ce,
                                       cfg.cls_weight_coeff)
    ref_chosen = torch_expand(ref_tensor, pool_im_idx0, pool_suppix0,
                              label.multi_hot_cls, label.id_to_index,
                              budget, fair_counting=True)
    ref_selected = {(lbl, sid) for lbl, sid, _ in ref_chosen}

    # score-tensor parity (product list covers the initial pool)
    prod_map = {(p.split(",")[1], int(i)): s for s, p, i in prod_scores}
    ref_map = {}
    for kdx, key in enumerate(pool_im_idx0):
        for i in pool_suppix0[key[2]]:
            ref_map[(key[1], int(i))] = float(ref_tensor[kdx][i])
    assert prod_map.keys() == ref_map.keys()
    score_dev = max(abs(prod_map[k] - ref_map[k]) for k in prod_map)
    # tie handling: a region may flip across the budget cutoff when its
    # score is within float noise of the last-selected score
    cutoff = min(s for _, _, s in ref_chosen)
    mismatch = prod_selected ^ ref_selected
    tie_ok = all(abs(prod_map[k] - cutoff) < max(10 * score_dev, 1e-6)
                 for k in mismatch)
    report["selection"] = {
        "score_dev": score_dev, "n_prod": len(prod_selected),
        "n_ref": len(ref_selected), "n_mismatch": len(mismatch),
        "ties_explain_mismatch": tie_ok}
    if verbose:
        print(f"[A selection] score dev {score_dev:.2e}, "
              f"selected {len(prod_selected)} vs {len(ref_selected)}, "
              f"mismatch {len(mismatch)} (ties: {tie_ok})")

    # ======================================================================
    # B. stage-1 lockstep on the recorded batch stream
    # ======================================================================
    criterion = get_criterion(cfg)
    state = create_train_state(fm, cfg, jax.random.PRNGKey(0), (B, HH, HH, 3))
    state = state.replace(params=variables0["params"],
                          batch_stats=variables0["batch_stats"],
                          opt_state=state.tx.init(variables0["params"]))
    opt = torch.optim.AdamW(
        [{"params": list(tm.backbone.parameters()), "lr": lr},
         {"params": list(tm.classifier.parameters()),
          "lr": lr * cls_scale}],
        lr=lr, betas=(0.9, 0.999), eps=1e-8, weight_decay=wd)

    train_loader = DataProvider(label, B, shuffle=True, drop_last=True,
                                infinite=True, num_workers=0, seed=seed)
    batches1 = []
    for _ in range(steps1):
        batches1.append(next(train_loader))

    @jax.jit
    def jstep1(state, batch):
        def loss_fn(params, bs):
            logits, mut = fm.apply(
                {"params": params, "batch_stats": bs}, batch["images"],
                train=True, mutable=["batch_stats"])
            total, aux = criterion(logits, batch)
            return total, mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats)
        return state.apply_gradients(grads, new_bs), loss

    from tools_dev.trajectory_parity import torch_lossdecomp

    power, min_lr = cfg.power, cfg.min_lr
    t1, j1 = [], []
    for it, b in enumerate(batches1):
        f = (1.0 - it / cfg.finetune_itrs) ** power
        opt.param_groups[0]["lr"] = max(lr * f, min_lr)
        opt.param_groups[1]["lr"] = max(lr * cls_scale * f, min_lr)
        x = torch.from_numpy(np.asarray(b["images"]).transpose(0, 3, 1, 2))
        opt.zero_grad()
        _, logits = tm(x)
        tl_, *_ = torch_lossdecomp(
            torch, F, logits,
            torch.from_numpy(np.asarray(b["target"], np.float32)),
            torch.from_numpy(np.asarray(b["spx"]).astype(np.int64)),
            torch.from_numpy(np.asarray(b["spmask"])), nseg=S,
            coeff=coeff, coeff_mc=coeff_mc, coeff_gm=coeff_gm,
            t_mc=t_mc, t_gm=t_gm)
        tl_.backward()
        opt.step()
        t1.append(float(tl_.detach()))
        jb = {k: jnp.asarray(v) for k, v in b.items()
              if k in ("images", "target", "spx", "spmask", "target_bits")}
        state, jl_ = jstep1(state, jb)
        j1.append(float(jl_))
        if verbose:
            print(f"  [B] step {it} torch {t1[-1]:.5f} jax {j1[-1]:.5f}")
    rel1 = np.abs(np.array(t1) - np.array(j1)) / np.maximum(
        np.abs(np.array(t1)), 1e-6)
    report["stage1"] = {"mean_rel": float(rel1.mean()),
                        "max_rel": float(rel1.max()),
                        "step0_rel": float(rel1[0]),
                        "final_torch": t1[-1], "final_jax": j1[-1]}
    if verbose:
        print(f"[B stage-1] {steps1} steps rel gap mean {rel1.mean():.2e} "
              f"max {rel1.max():.2e}")

    # ======================================================================
    # C. plbl parity at synchronized (post-stage-1) weights
    # ======================================================================
    sd1 = export_sd()
    variables1 = torch_state_dict_to_variables(sd1, wn_head=True)
    gen = PseudoLabelGenerator(fm, cfg, plbl_type="cosprop_includeonehot")
    eval_loader = DataProvider(label, 1, shuffle=False, drop_last=False,
                               infinite=False, num_workers=0)
    prod_plbls = {}
    for b in eval_loader:
        plbl, _ = gen.plbl_for_batch(variables1["params"],
                                     variables1["batch_stats"], b,
                                     suppix=label.suppix)
        prod_plbls[b["fnames"][0][1]] = np.asarray(plbl).astype(np.int64)

    tm.eval()
    agree, total = 0, 0
    ref_plbls = {}
    with torch.no_grad():
        for b in DataProvider(label, 1, shuffle=False, drop_last=False,
                              infinite=False, num_workers=0):
            x = torch.from_numpy(
                np.asarray(b["images"]).transpose(0, 3, 1, 2))
            feat, logits = tm(x)
            probs = F.softmax(logits[0], dim=0).permute(1, 2, 0)
            feats = feat[0].permute(1, 2, 0)
            spx_map = np.asarray(b["spx"][0])
            spmask = np.asarray(b["spmask"][0]).astype(bool)
            targets = np.asarray(b["target"][0], np.float32)
            want = ref_cosplbl(
                feats.reshape(-1, feats.shape[-1]).numpy(),
                probs.reshape(-1, probs.shape[-1]).numpy(),
                targets, spx_map, spmask, S, include_onehot=True,
                method="median")
            ref_plbls[b["fnames"][0][1]] = want.astype(np.int64)
            got = prod_plbls[b["fnames"][0][1]]
            agree += int((got == want).sum())
            total += want.size
    tm.train()
    report["plbl"] = {"pixel_agreement": agree / max(total, 1)}
    if verbose:
        print(f"[C plbl] pixel agreement {agree / max(total, 1):.4f} "
              f"({agree}/{total})")

    # ======================================================================
    # D. stage-2 CE retrain on the PRODUCT plbl maps, from the original
    #    init, same batch stream; final val mIoU compared
    # ======================================================================
    tm.load_state_dict({k: torch.from_numpy(v) for k, v in sd0.items()})
    cfg2 = copy.copy(cfg)
    cfg2.method = "active_predignore"
    criterion2 = get_criterion(cfg2)
    state2 = create_train_state(fm, cfg2, jax.random.PRNGKey(0),
                                (B, HH, HH, 3))
    state2 = state2.replace(params=variables0["params"],
                            batch_stats=variables0["batch_stats"],
                            opt_state=state2.tx.init(variables0["params"]))
    opt2 = torch.optim.AdamW(
        [{"params": list(tm.backbone.parameters()), "lr": lr},
         {"params": list(tm.classifier.parameters()),
          "lr": lr * cls_scale}],
        lr=lr, betas=(0.9, 0.999), eps=1e-8, weight_decay=wd)

    @jax.jit
    def jstep2(state, x, y):
        def loss_fn(params, bs):
            logits, mut = fm.apply(
                {"params": params, "batch_stats": bs}, x, train=True,
                mutable=["batch_stats"])
            total, _ = criterion2(logits, {"labels": y})
            return total, mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats)
        return state.apply_gradients(grads, new_bs), loss

    # stage-2 batches: labeled images with their plbl maps as labels
    rng = np.random.RandomState(seed + 1)
    img_by_lbl = {}
    for b in DataProvider(label, 1, shuffle=False, drop_last=False,
                          infinite=False, num_workers=0):
        img_by_lbl[b["fnames"][0][1]] = np.asarray(b["images"][0])
    lbl_ids = sorted(img_by_lbl)
    t2, j2 = [], []
    for it in range(steps2):
        pick = rng.choice(len(lbl_ids), B, replace=True)
        x = np.stack([img_by_lbl[lbl_ids[i]] for i in pick])
        y = np.stack([prod_plbls[lbl_ids[i]] for i in pick])
        f = (1.0 - it / cfg.finetune_itrs) ** power
        opt2.param_groups[0]["lr"] = max(lr * f, min_lr)
        opt2.param_groups[1]["lr"] = max(lr * cls_scale * f, min_lr)
        t2.append(torch_stage2_step(
            tm, opt2, torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(y), t_ce))
        state2, jl_ = jstep2(state2, jnp.asarray(x),
                             jnp.asarray(y.astype(np.int32)))
        j2.append(float(jl_))
        if verbose:
            print(f"  [D] step {it} torch {t2[-1]:.5f} jax {j2[-1]:.5f}")
    rel2 = np.abs(np.array(t2) - np.array(j2)) / np.maximum(
        np.abs(np.array(t2)), 1e-6)

    # val mIoU with each side's final stage-2 model (shared pinned metric)
    tm.eval()
    miou_t = MeanIoU(Cm, 255)
    miou_j = MeanIoU(Cm, 255)
    jfwd = jax.jit(lambda p, bs, x: fm.apply(
        {"params": p, "batch_stats": bs}, x, train=False))
    with torch.no_grad():
        for b in DataProvider(val, 1, shuffle=False, drop_last=False,
                              infinite=False, num_workers=0):
            x = np.asarray(b["images"])
            yt = np.asarray(b["labels"])
            _, lg_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
            pred_t = lg_t.argmax(1).numpy()
            lg_j = np.asarray(jfwd(state2.params, state2.batch_stats,
                                   jnp.asarray(x)))
            pred_j = lg_j.argmax(-1)
            miou_t._after_step({"outputs": pred_t, "targets": yt})
            miou_j._after_step({"outputs": pred_j, "targets": yt})
    mt = float(np.mean(miou_t._after_epoch_ipr()[0]))
    mj = float(np.mean(miou_j._after_epoch_ipr()[0]))
    report["stage2"] = {"mean_rel": float(rel2.mean()),
                        "max_rel": float(rel2.max()),
                        "step0_rel": float(rel2[0]),
                        "miou_torch": mt, "miou_jax": mj,
                        "miou_gap": abs(mt - mj)}
    if verbose:
        print(f"[D stage-2] {steps2} steps rel gap mean {rel2.mean():.2e} "
              f"max {rel2.max():.2e}; val mIoU torch {mt:.2f} vs jax "
              f"{mj:.2f} (|gap| {abs(mt - mj):.2f})")
    return report


if __name__ == "__main__":
    _force_cpu()
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps1", type=int, default=20)
    ap.add_argument("--steps2", type=int, default=20)
    ap.add_argument("--lr", type=float, default=1e-4)
    args = ap.parse_args()
    rep = run(steps1=args.steps1, steps2=args.steps2, lr=args.lr)
    print(rep)
