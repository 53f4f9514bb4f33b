"""Multi-round (default 5) FREE-RUNNING AL parity: the full reference
protocol — select -> stage-1 train -> plbl, feeding forward across rounds
(/root/reference/train_AL.py:37-82 with --max_iterations 5 and
--start_over, script/open_source/train_city_mul_res50.sh) — run
independently on the product path and on torch transcriptions, with NO
weight synchronization between rounds. This extends the one-round harness
(tools_dev/round_parity.py, which pins each stage at synchronized
weights) to the PRODUCT question: do the two implementations, each
compounding its own numeric noise round over round, keep choosing the
same regions, generating the same pseudo-labels, and landing at the same
final quality?

Free-running protocol per round r (both sides independently):
  1. score the pool with the PREVIOUS round's post-stage-1 weights
     (train_AL.py:50-52 prevckpt; round 1 scores with the shared init),
     select to budget (expand_training_set walk).
  2. start_over: reset weights to the shared init
     (train_AL.py:73-74) and train stage-1 on the side's OWN labeled
     set. Optimizer: SGD momentum 0.9 (cfg.optimizer='sgd',
     trainer/base.py:72-75 second branch) — deterministic error
     propagation, the same trick that tightened the dryrun trajectory
     bound from 0.3 (AdamW sign-descent) to 0.05.
  3. generate cosine-prototype plbl maps for the side's labeled images
     with the side's post-stage-1 weights.
After the last round: stage-2 CE retrain from init on each side's OWN
plbl maps, then val mIoU with each side's final model (stage-2 is a leaf
of the round loop — selection and plbl both read stage-1 checkpoints, so
it only needs running once).

What is assertable under free running: the loss landscape at temp 0.1
amplifies float noise by ~x30/step (measured here: step-0 rel 1e-5 ->
step-3 rel 1.3e-1 at lr 1e-5, the same Lyapunov rate the dryrun's 3-step
SGD bound 0.05 reflects), so per-step loss parity is meaningless beyond
~4 steps and per-pixel plbl agreement between honestly-drifted weights
is bounded by the drift, not the implementation. The harness therefore
pins, per round:
  - selection-set Jaccard between the sides' OWN (drifted) models —
    the product-level claim that the AL loop keeps choosing the same
    regions;
  - step-0 stage-1 loss rel gap (shared init + each side's own labeled
    set: tight iff the selected data and loss machinery agree);
  - SYNCED-weights plbl agreement: the twin's post-stage-1 weights are
    imported into flax and both sides generate plbl from the SAME
    drifted state — pins the plbl implementation at r fresh weight
    states (extends round_parity's single-state 99.996%);
  - free-running plbl agreement (reported, not bounded — drift-limited).
Final: stage-2 val mIoU gap, each side retraining from init on its own
free-running plbl maps. Calibration 2026-08-21 (rounds=5, steps1=8,
steps2=12, lr=3e-3 SGD): see BASELINE.md "Round-level parity".

Run: python tools_dev/round_parity_multi.py [--rounds N] [--steps1 N]
[--steps2 N] [--lr F]. tests/test_round_parity.py::test_multi_round
asserts the bounds at rounds=3.
"""

import argparse
import copy
import sys

import numpy as np


def torch_expand_paths(scores_tensor, pool_im_idx, pool_suppix,
                       label_multi_hot, id_to_index, budget,
                       fair_counting=True):
    """expand_training_set transcription returning full path triples
    (region_active_dataset.py:16-72). Returns ordered chosen list of
    (paths, spx_id, score)."""
    scores = []
    for kdx, key in enumerate(pool_im_idx):
        for i in pool_suppix[key[2]]:
            scores.append((float(scores_tensor[kdx][i]), ",".join(key),
                           int(i)))
    ordered = sorted(scores, reverse=True)
    selected_count = 0
    chosen = []
    for score, path, sid in ordered:
        paths = path.split(",")
        chosen.append((paths, sid, score))
        if fair_counting:
            idx = id_to_index[paths[1].split(".")[0]]
            selected_count += int(label_multi_hot[idx, sid].sum())
        else:
            selected_count += 1
        if selected_count > budget:
            break
    return chosen


def twin_apply_selection(chosen, pool_im_idx, pool_suppix, label_im_idx,
                         label_suppix):
    """Mutate the twin's pool/label bookkeeping the way
    expand_training_set does (region_active_dataset.py:34-54)."""
    for paths, sid, _ in chosen:
        spx_path = paths[2]
        if paths not in label_im_idx:
            label_im_idx.append(paths)
            label_suppix[spx_path] = [sid]
        else:
            label_suppix[spx_path].append(sid)
        pool_suppix[spx_path].remove(sid)
        if len(pool_suppix[spx_path]) == 0:
            pool_suppix.pop(spx_path)
            pool_im_idx.remove(paths)


def run(rounds=5, steps1=8, steps2=12, seed=0, n_pool=6, budget=24,
        lr=3e-3, verbose=True):
    import torch
    import torch.nn.functional as F

    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp

    from tests.test_full_model_parity import TorchDeepLab
    from tests.test_plbl import ref_cosplbl
    from tools_dev.round_parity import torch_selector_scores
    from tools_dev.trajectory_parity import torch_lossdecomp
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
    report = {"rounds": []}

    Creal, S, HH, B = 6, 16, 64, 2
    wd, cls_scale = 5e-4, 10.0
    coeff, coeff_mc, coeff_gm = 16.0, 8.0, 1.0
    t_mc = t_gm = t_ce = 0.1
    import tempfile

    tmpdir = tempfile.mkdtemp(prefix="round_parity_multi_")
    cfg = Config(num_classes=Creal, nseg=S, crop_size=(HH, HH),
                 train_batch_size=B, val_batch_size=2,
                 method="active_joint_multi_predignore_lossdecomp",
                 active_method="my_bvsb_predclsbal_pwr_banignore",
                 or_labeling=True, fair_counting=True,
                 optimizer="sgd",
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
    # product-side pool/label pair + a TWIN pair over the SAME fixture
    # arrays (seed=1 makes the underlying images/GT/multi-hot identical)
    pool = mk("active-ulabel", n_pool)
    label = mk("active-label", n_pool)
    label.suppix, label.im_idx = {}, []
    t_pool = mk("active-ulabel", n_pool)
    t_label = mk("active-label", n_pool)
    t_label.suppix, t_label.im_idx = {}, []
    val = mk("val", 3)
    active_set = RegionActiveSet(cfg, pool, label)

    Cm = Creal + 1
    tm = TorchDeepLab(num_classes=Cm)
    tm.train()
    for m in tm.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    import flax.linen as fnn

    fnn.Dropout.__call__ = lambda self, x, **kw: x  # harness-only patch

    def export_sd():
        return {k: v.detach().numpy().copy()
                for k, v in tm.state_dict().items()}

    fm = DeepLabV3(
        backbone=ResNet(layers=(2, 2, 2, 2), deep_stem=True, stem_width=16,
                        replace_stride_with_dilation=(False, False, True),
                        stage_planes=(16, 32, 64, 128)),
        classifier=DeepLabHeadV3Plus(Cm, (6, 12, 18), variant="wn",
                                     low_channels=12, mid_channels=64))

    sd0 = export_sd()
    variables0 = torch_state_dict_to_variables(sd0, wn_head=True)

    criterion = get_criterion(cfg)
    power, min_lr = cfg.power, cfg.min_lr

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

    jfwd = jax.jit(lambda variables, x: fm.apply(variables, x, train=False))

    class _Shim:
        def __init__(self, variables):
            self._v = variables

        def predict_logits(self, images):
            return jfwd(self._v, jnp.asarray(images))

    def make_torch_opt(lr_now):
        # SGD momentum 0.9, weight decay added to the grad BEFORE momentum
        # == optax.chain(add_decayed_weights, sgd(momentum)) in
        # engine/state.py:52-55
        return torch.optim.SGD(
            [{"params": list(tm.backbone.parameters()), "lr": lr_now},
             {"params": list(tm.classifier.parameters()),
              "lr": lr_now * cls_scale}],
            lr=lr_now, momentum=0.9, weight_decay=wd)

    def twin_pool_batches():
        """Pool batches from the twin's OWN bookkeeping (order = twin
        im_idx), mirroring DataProvider(pool, shuffle=False)."""
        items = []
        for key in t_pool.im_idx:
            gidx = t_pool.id_to_index[key[1].split(".")[0]]
            from mulactseg_tpu.data.transforms import normalize
            items.append((normalize(t_pool.images[gidx]),
                          t_pool.spx_map.astype(np.int64)))
        out = []
        bs = cfg.val_batch_size
        for i in range(0, len(items), bs):
            chunk = items[i:i + bs]
            x = torch.from_numpy(
                np.stack([c[0] for c in chunk]).transpose(0, 3, 1, 2))
            sp = torch.from_numpy(np.stack([c[1] for c in chunk]))
            out.append((x, sp))
        return out

    # persistent weights across rounds: the "previous round checkpoint"
    variables_prev = variables0
    sd_prev = sd0

    prod_plbls, twin_plbls = {}, {}

    for r in range(1, rounds + 1):
        # -- 1. selection with prev-round weights ---------------------------
        active_set.selection_iter = r
        selector = get_selector(cfg.active_method, cfg)
        prod_scores = selector.calculate_scores(_Shim(variables_prev), pool)
        active_set.expand_training_set(
            sorted(prod_scores, reverse=True), budget, cfg.active_method)
        prod_selected = {(key[1], int(v)) for key in label.im_idx
                         for v in label.suppix[key[2]]}

        tm.load_state_dict({k: torch.from_numpy(v)
                            for k, v in sd_prev.items()})
        ref_tensor_rows = torch_selector_scores(
            tm, twin_pool_batches(), S, Creal, t_ce, cfg.cls_weight_coeff)
        chosen = torch_expand_paths(
            ref_tensor_rows, t_pool.im_idx, t_pool.suppix,
            t_label.multi_hot_cls, t_label.id_to_index, budget,
            fair_counting=True)
        twin_apply_selection(chosen, t_pool.im_idx, t_pool.suppix,
                             t_label.im_idx, t_label.suppix)
        t_label_selected = {(key[1], int(v)) for key in t_label.im_idx
                            for v in t_label.suppix[key[2]]}
        inter = prod_selected & t_label_selected
        union = prod_selected | t_label_selected
        jac = len(inter) / max(len(union), 1)

        # -- 2. start_over stage-1 on each side's own labeled set -----------
        state = create_train_state(fm, cfg, jax.random.PRNGKey(0),
                                   (B, HH, HH, 3))
        state = state.replace(params=variables0["params"],
                              batch_stats=variables0["batch_stats"],
                              opt_state=state.tx.init(variables0["params"]))
        tm.load_state_dict({k: torch.from_numpy(v) for k, v in sd0.items()})
        opt = make_torch_opt(lr)

        # each side samples by index into its OWN im_idx with the same rng
        # stream: identical batches whenever the selections agree
        ploader = DataProvider(label, B, shuffle=True, drop_last=True,
                               infinite=True, num_workers=0,
                               seed=seed + r)
        tloader = DataProvider(t_label, B, shuffle=True, drop_last=True,
                               infinite=True, num_workers=0,
                               seed=seed + r)
        t1 = j1 = step0_rel = None
        for it in range(steps1):
            f = (1.0 - it / cfg.finetune_itrs) ** power
            opt.param_groups[0]["lr"] = max(lr * f, min_lr)
            opt.param_groups[1]["lr"] = max(lr * cls_scale * f, min_lr)
            tb = next(tloader)
            x = torch.from_numpy(
                np.asarray(tb["images"]).transpose(0, 3, 1, 2))
            opt.zero_grad()
            _, logits = tm(x)
            tl_, *_ = torch_lossdecomp(
                torch, F, logits,
                torch.from_numpy(np.asarray(tb["target"], np.float32)),
                torch.from_numpy(np.asarray(tb["spx"]).astype(np.int64)),
                torch.from_numpy(np.asarray(tb["spmask"])), nseg=S,
                coeff=coeff, coeff_mc=coeff_mc, coeff_gm=coeff_gm,
                t_mc=t_mc, t_gm=t_gm)
            tl_.backward()
            opt.step()
            t1 = float(tl_.detach())

            pb = next(ploader)
            jb = {k: jnp.asarray(v) for k, v in pb.items()
                  if k in ("images", "target", "spx", "spmask",
                           "target_bits")}
            state, jl_ = jstep1(state, jb)
            j1 = float(jl_)
            if it == 0:
                step0_rel = abs(t1 - j1) / max(abs(t1), 1e-6)
            if verbose:
                print(f"  [r{r} s{it}] torch {t1:.5f} jax {j1:.5f}")
        final_rel = abs(t1 - j1) / max(abs(t1), 1e-6)

        sd_prev = export_sd()
        variables_prev = {"params": state.params,
                          "batch_stats": state.batch_stats}

        # -- 3. plbl with each side's own post-stage-1 weights --------------
        gen = PseudoLabelGenerator(fm, cfg, plbl_type="cosprop_includeonehot")
        for b in DataProvider(label, 1, shuffle=False, drop_last=False,
                              infinite=False, num_workers=0):
            plbl, _ = gen.plbl_for_batch(
                variables_prev["params"], variables_prev["batch_stats"], b,
                suppix=label.suppix)
            prod_plbls[b["fnames"][0][1]] = np.asarray(plbl).astype(np.int64)

        tm.eval()
        agree, total = 0, 0
        with torch.no_grad():
            for b in DataProvider(t_label, 1, shuffle=False,
                                  drop_last=False, infinite=False,
                                  num_workers=0):
                x = torch.from_numpy(
                    np.asarray(b["images"]).transpose(0, 3, 1, 2))
                feat, logits = tm(x)
                probs = F.softmax(logits[0], dim=0).permute(1, 2, 0)
                feats = feat[0].permute(1, 2, 0)
                targets = np.asarray(b["target"][0], np.float32)
                want = ref_cosplbl(
                    feats.reshape(-1, feats.shape[-1]).numpy(),
                    probs.reshape(-1, probs.shape[-1]).numpy(),
                    targets, np.asarray(b["spx"][0]),
                    np.asarray(b["spmask"][0]).astype(bool), S,
                    include_onehot=True, method="median")
                twin_plbls[b["fnames"][0][1]] = want.astype(np.int64)
                if b["fnames"][0][1] in prod_plbls:
                    got = prod_plbls[b["fnames"][0][1]]
                    agree += int((got == want).sum())
                    total += want.size
        tm.train()
        plbl_agree_free = agree / max(total, 1)

        # synced-weights plbl probe: the twin's post-stage-1 weights into
        # flax, product plbl generator at that SAME state vs the twin's
        # maps — pins the plbl implementation at this round's drifted
        # weights, independent of trajectory chaos
        variables_sync = torch_state_dict_to_variables(sd_prev,
                                                       wn_head=True)
        s_agree, s_total = 0, 0
        for b in DataProvider(t_label, 1, shuffle=False, drop_last=False,
                              infinite=False, num_workers=0):
            plbl, _ = gen.plbl_for_batch(
                variables_sync["params"], variables_sync["batch_stats"], b,
                suppix=t_label.suppix)
            got = np.asarray(plbl).astype(np.int64)
            want = twin_plbls[b["fnames"][0][1]]
            s_agree += int((got == want).sum())
            s_total += want.size
        plbl_agree_sync = s_agree / max(s_total, 1)

        row = {"round": r, "selection_jaccard": jac,
               "n_selected": (len(prod_selected), len(t_label_selected)),
               "stage1_step0_rel": step0_rel,
               "stage1_final_rel": final_rel,
               "plbl_agreement_synced": plbl_agree_sync,
               "plbl_agreement_free": plbl_agree_free}
        report["rounds"].append(row)
        if verbose:
            print(f"[round {r}] selection jaccard {jac:.4f} "
                  f"({len(prod_selected)}/{len(t_label_selected)}), "
                  f"step0 rel {step0_rel:.3e}, final rel {final_rel:.3e}, "
                  f"plbl agreement synced {plbl_agree_sync:.4f} / "
                  f"free {plbl_agree_free:.4f}")

    # -- final: stage-2 from init on each side's own plbl maps --------------
    cfg2 = copy.copy(cfg)
    cfg2.method = "active_predignore"
    criterion2 = get_criterion(cfg2)
    state2 = create_train_state(fm, cfg2, jax.random.PRNGKey(0),
                                (B, HH, HH, 3))
    state2 = state2.replace(params=variables0["params"],
                            batch_stats=variables0["batch_stats"],
                            opt_state=state2.tx.init(variables0["params"]))
    tm.load_state_dict({k: torch.from_numpy(v) for k, v in sd0.items()})
    opt2 = make_torch_opt(lr)

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

    img_by_lbl = {}
    for b in DataProvider(label, 1, shuffle=False, drop_last=False,
                          infinite=False, num_workers=0):
        img_by_lbl[b["fnames"][0][1]] = np.asarray(b["images"][0])
    p_ids = sorted(k for k in img_by_lbl if k in prod_plbls)
    t_ids = sorted(k for k in twin_plbls)
    rng = np.random.RandomState(seed + 99)
    for it in range(steps2):
        f = (1.0 - it / cfg.finetune_itrs) ** power
        opt2.param_groups[0]["lr"] = max(lr * f, min_lr)
        opt2.param_groups[1]["lr"] = max(lr * cls_scale * f, min_lr)
        pick = rng.choice(len(p_ids), B, replace=True)
        x = np.stack([img_by_lbl[p_ids[i]] for i in pick])
        yp = np.stack([prod_plbls[p_ids[i]] for i in pick])
        yt = np.stack([twin_plbls[t_ids[i]] if t_ids[i] in twin_plbls
                       else prod_plbls[p_ids[i]] for i in pick])
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        opt2.zero_grad()
        _, logits = tm(xt)
        loss_t = F.cross_entropy(logits / t_ce, torch.from_numpy(yt),
                                 ignore_index=255)
        loss_t.backward()
        opt2.step()
        state2, _ = jstep2(state2, jnp.asarray(x),
                           jnp.asarray(yp.astype(np.int32)))

    tm.eval()
    miou_t = MeanIoU(Cm, 255)
    miou_j = MeanIoU(Cm, 255)
    jfwd2 = jax.jit(lambda p, bs, x: fm.apply(
        {"params": p, "batch_stats": bs}, x, train=False))
    with torch.no_grad():
        for b in DataProvider(val, 1, shuffle=False, drop_last=False,
                              infinite=False, num_workers=0):
            x = np.asarray(b["images"])
            yv = np.asarray(b["labels"])
            _, lg_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
            miou_t._after_step({"outputs": lg_t.argmax(1).numpy(),
                                "targets": yv})
            lg_j = np.asarray(jfwd2(state2.params, state2.batch_stats,
                                    jnp.asarray(x)))
            miou_j._after_step({"outputs": lg_j.argmax(-1), "targets": yv})
    mt = float(np.mean(miou_t._after_epoch_ipr()[0]))
    mj = float(np.mean(miou_j._after_epoch_ipr()[0]))
    report["final"] = {"miou_torch": mt, "miou_jax": mj,
                       "miou_gap": abs(mt - mj)}
    if verbose:
        print(f"[final] stage-2 val mIoU torch {mt:.2f} vs jax {mj:.2f} "
              f"(|gap| {abs(mt - mj):.2f})")
    return report


if __name__ == "__main__":
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tools_dev.round_parity import _force_cpu

    _force_cpu()
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--steps1", type=int, default=8)
    ap.add_argument("--steps2", type=int, default=12)
    ap.add_argument("--lr", type=float, default=3e-3)
    args = ap.parse_args()
    rep = run(rounds=args.rounds, steps1=args.steps1, steps2=args.steps2,
              lr=args.lr)
    print(rep)
