"""Optimization-trajectory parity: torch twin vs flax model, identical
init / batches / optimizer / schedule, N steps of CE training.

Validates the full optimizer semantics chain (trainer/base.py:64-76):
AdamW(b1=.9, b2=.999, eps=1e-8, weight_decay) with the classifier group
at cls_lr_scale x LR, PolyLR per iteration with a min floor
(utils/scheduler.py:4-13), train-mode BatchNorm with momentum 0.1 (torch
convention) and local batch statistics.

Run: python tools_dev/trajectory_parity.py [--steps 200]
Prints per-step losses every 20 steps and the max/mean relative gap.
tests/test_trajectory_parity.py asserts the same at 60 steps (suite
wall-clock); measured at 200 steps on this box (2026-08-17): plain CE
mean 8.1e-4 / max 4.2e-3, lossdecomp mean 1.13e-2 / max 4.8e-2 —
recorded in BASELINE.md.
"""

import argparse
import sys

import numpy as np


def run(steps=200, lr=1e-3, seed=0, print_every=20):
    import torch
    import torch.nn.functional as F

    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp

    from tests.test_full_model_parity import TorchDeepLab
    from mulactseg_tpu.config import Config
    from mulactseg_tpu.engine.state import create_train_state
    from mulactseg_tpu.models.deeplab import DeepLabHeadV3Plus, DeepLabV3
    from mulactseg_tpu.models.resnet import ResNet
    from mulactseg_tpu.models.torch_import import torch_state_dict_to_variables

    torch.manual_seed(seed)
    torch.set_num_threads(1)
    C, B, H = 7, 2, 65
    total = steps
    wd, power, min_lr, cls_scale = 5e-4, 0.9, 1e-6, 10.0

    tm = TorchDeepLab(num_classes=C)
    tm.train()
    # dropout noise is framework-RNG-specific and would make the two
    # trajectories incomparable — zero it on both sides
    for m in tm.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    import flax.linen as fnn

    fnn.Dropout.__call__ = lambda self, x, **kw: x  # harness-only patch
    backbone_p = list(tm.backbone.parameters())
    cls_p = list(tm.classifier.parameters())
    opt = torch.optim.AdamW(
        [{"params": backbone_p, "lr": lr},
         {"params": cls_p, "lr": lr * cls_scale}],
        lr=lr, betas=(0.9, 0.999), eps=1e-8, weight_decay=wd)

    # identical init on the flax side via the weight importer
    # .numpy() would SHARE memory with the live torch tensors — opt.step()
    # mutates in place and the flax import keeps numpy views, so without
    # the copy the jax model silently reads post-step torch weights
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
    variables = torch_state_dict_to_variables(sd, wn_head=True)
    fm = DeepLabV3(
        backbone=ResNet(layers=(2, 2, 2, 2), deep_stem=True, stem_width=16,
                        replace_stride_with_dilation=(False, False, True),
                        stage_planes=(16, 32, 64, 128)),
        classifier=DeepLabHeadV3Plus(C, (6, 12, 18), variant="wn",
                                     low_channels=12, mid_channels=64))
    cfg = Config(num_classes=C - 1, nseg=8, crop_size=(H, H),
                 train_lr=lr, cls_lr_scale=cls_scale, weight_decay=wd,
                 power=power, min_lr=min_lr, finetune_itrs=total,
                 dtype="float32", loader="synthetic")
    state = create_train_state(fm, cfg, jax.random.PRNGKey(0), (B, H, H, 3))
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"],
                          opt_state=state.tx.init(variables["params"]))

    rng = np.random.RandomState(seed)
    batches = [(rng.randn(B, H, H, 3).astype(np.float32),
                rng.randint(0, C, (B, H, H)).astype(np.int64))
               for _ in range(8)]

    @jax.jit
    def jstep(state, x, y):
        def loss_fn(params, bs):
            logits, mut = fm.apply(
                {"params": params, "batch_stats": bs}, x, train=True,
                mutable=["batch_stats"])
            ll = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            loss = -jnp.mean(jnp.take_along_axis(ll, y[..., None], -1))
            return loss, mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats)
        return state.apply_gradients(grads, new_bs), loss

    t_losses, j_losses = [], []
    for it in range(steps):
        x, y = batches[it % len(batches)]
        # poly LR with floor (utils/scheduler.py:4-13)
        f = (1.0 - it / total) ** power
        opt.param_groups[0]["lr"] = max(lr * f, min_lr)
        opt.param_groups[1]["lr"] = max(lr * cls_scale * f, min_lr)

        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        yt = torch.from_numpy(y)
        opt.zero_grad()
        _, logits = tm(xt)
        tl = F.cross_entropy(logits, yt)
        tl.backward()
        opt.step()
        t_losses.append(float(tl))

        state, jl = jstep(state, jnp.asarray(x), jnp.asarray(y))
        j_losses.append(float(jl))
        if it % print_every == 0:
            print(f"step {it:4d}  torch {t_losses[-1]:.5f}  "
                  f"jax {j_losses[-1]:.5f}")

    t = np.array(t_losses)
    j = np.array(j_losses)
    rel = np.abs(t - j) / np.maximum(np.abs(t), 1e-6)
    print(f"loss-curve relative gap: mean {rel.mean():.2e}  "
          f"max {rel.max():.2e}  final torch {t[-1]:.5f} jax {j[-1]:.5f}")
    return rel


def torch_lossdecomp(torch, F, logits, targets, spx, spmask, *, nseg,
                     coeff, coeff_mc, coeff_gm, t_mc, t_gm):
    """Transcription of the reference stage-1 criterion: per-image loops of
    OnehotCEMultihotChoice (active_joint_multi_predignore_lossdecomp.py:
    16-72) + GroupMultiLabelCE_onlymulti
    (active_joint_multi_predignore_mclossablation2.py) with the trainer
    combination coeff*ce + coeff_mc*mc + coeff_gm*group
    (active_joint_multi_predignore_lossdecomp.py:100-104).
    torch_scatter.scatter(reduce='max') is emulated with scatter_reduce
    amax / include_self=False (empty segments keep 0)."""
    eps = 1e-8
    N, Cc, H, W = logits.shape
    sp = spx.reshape(N, -1)
    m = spmask.reshape(N, -1)

    out = F.softmax(logits / t_mc, dim=1).permute(0, 2, 3, 1).reshape(N, -1, Cc)
    oh_loss = 0
    oh_num = 1
    mh_loss = 0
    mh_num = 1
    for i in range(N):
        if not m[i].any():
            continue
        vo = out[i][m[i]]
        vs = sp[i][m[i]]
        trg_pixel = targets[i][vs]
        pos = (vo * trg_pixel).sum(1)
        oh = trg_pixel.sum(1) == 1
        if oh.any():
            oh_loss = oh_loss + (-torch.log(pos[oh] + eps)).sum()
            oh_num = oh_num + int(oh.sum())
        mh = ~oh
        if mh.any():
            mh_loss = mh_loss + (-torch.log(pos[mh] + eps)).sum()
            mh_num = mh_num + int(mh.sum())
    ce = oh_loss / oh_num
    mc = mh_loss / mh_num

    outg = F.softmax(logits / t_gm, dim=1).permute(0, 2, 3, 1).reshape(N, -1, Cc)
    empty = targets.any(2)
    ismulti = targets.sum(2) > 1
    g_loss = 0
    g_num = 1
    for i in range(N):
        if not m[i].any():
            continue
        mm = ismulti[i][sp[i][m[i]]]
        vm = m[i].clone()
        vm[m[i]] = mm
        if not vm.any():
            continue
        vo = outg[i][vm]
        vs = sp[i][vm]
        mx = torch.zeros(nseg, Cc, dtype=vo.dtype).scatter_reduce(
            0, vs[:, None].expand(-1, Cc), vo, reduce="amax",
            include_self=False)
        top = mx[empty[i]] * targets[i][empty[i]]
        nz = top[top != 0]
        g_num = g_num + nz.shape[0]
        g_loss = g_loss + (-torch.log(nz + eps)).sum()
    group = g_loss / g_num
    total = coeff * ce + coeff_mc * mc + coeff_gm * group
    return total, ce, mc, group


def run_lossdecomp(steps=200, lr=1e-3, seed=0, print_every=20):
    """Trajectory parity under the SHIPPED stage-1 criterion (lossdecomp:
    one-hot CE + merged-positive MC + group max through the segment
    engine) on synthetic superpixel batches — recipe-style temps/coeffs
    (script/open_source/train_city_mul_res50.sh: 0.1/0.1, 16/8/1)."""
    import torch
    import torch.nn.functional as F

    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp

    from tests.test_full_model_parity import TorchDeepLab
    from mulactseg_tpu.config import Config
    from mulactseg_tpu.data.synthetic import grid_superpixels
    from mulactseg_tpu.engine.state import create_train_state
    from mulactseg_tpu.engine.train import CRITERIA
    from mulactseg_tpu.losses.fused import pixel_target_bits
    from mulactseg_tpu.models.deeplab import DeepLabHeadV3Plus, DeepLabV3
    from mulactseg_tpu.models.resnet import ResNet
    from mulactseg_tpu.models.torch_import import torch_state_dict_to_variables

    torch.manual_seed(seed)
    torch.set_num_threads(1)
    C, B, H, S = 7, 2, 65, 12      # C = 6 real + undefined (predignore)
    total = steps
    wd, power, min_lr, cls_scale = 5e-4, 0.9, 1e-6, 10.0
    coeff, coeff_mc, coeff_gm, t_mc, t_gm = 16.0, 8.0, 1.0, 0.1, 0.1

    tm = TorchDeepLab(num_classes=C)
    tm.train()
    for mmod in tm.modules():
        if isinstance(mmod, torch.nn.Dropout):
            mmod.p = 0.0
    import flax.linen as fnn

    fnn.Dropout.__call__ = lambda self, x, **kw: x  # harness-only patch
    opt = torch.optim.AdamW(
        [{"params": list(tm.backbone.parameters()), "lr": lr},
         {"params": list(tm.classifier.parameters()), "lr": lr * cls_scale}],
        lr=lr, betas=(0.9, 0.999), eps=1e-8, weight_decay=wd)

    # .numpy() would SHARE memory with the live torch tensors — opt.step()
    # mutates in place and the flax import keeps numpy views, so without
    # the copy the jax model silently reads post-step torch weights
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
    variables = torch_state_dict_to_variables(sd, wn_head=True)
    fm = DeepLabV3(
        backbone=ResNet(layers=(2, 2, 2, 2), deep_stem=True, stem_width=16,
                        replace_stride_with_dilation=(False, False, True),
                        stage_planes=(16, 32, 64, 128)),
        classifier=DeepLabHeadV3Plus(C, (6, 12, 18), variant="wn",
                                     low_channels=12, mid_channels=64))
    cfg = Config(num_classes=C - 1, nseg=S, crop_size=(H, H),
                 train_lr=lr, cls_lr_scale=cls_scale, weight_decay=wd,
                 power=power, min_lr=min_lr, finetune_itrs=total,
                 coeff=coeff, coeff_mc=coeff_mc, coeff_gm=coeff_gm,
                 multi_ce_temp=t_mc, group_ce_temp=t_gm,
                 method="active_joint_multi_predignore_lossdecomp",
                 dtype="float32", loader="synthetic")
    state = create_train_state(fm, cfg, jax.random.PRNGKey(0), (B, H, H, 3))
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"],
                          opt_state=state.tx.init(variables["params"]))
    criterion = CRITERIA[cfg.method](cfg)

    # synthetic superpixel batches: contiguous grid superpixels, random
    # multi-hot candidate sets (mix of one-hot and multi-hot rows), ~60%
    # of superpixels selected
    rng = np.random.RandomState(seed)
    spx_map = grid_superpixels(H, H, S)
    batches = []
    for _ in range(8):
        x = rng.randn(B, H, H, 3).astype(np.float32)
        tgt = np.zeros((B, S, C), np.float32)
        spm = np.zeros((B, H, H), bool)
        bits = np.zeros((B, H, H), np.int32)
        spx_b = np.stack([spx_map] * B)
        for b in range(B):
            ncand = rng.choice([1, 1, 2, 3], size=S)
            for s in range(S):
                tgt[b, s, rng.choice(C, ncand[s], replace=False)] = 1.0
            sel = rng.rand(S) < 0.6
            spm[b] = sel[spx_map]
            bits[b] = pixel_target_bits(tgt[b], spx_map, spm[b])
        batches.append((x, tgt, spx_b, spm, bits))

    @jax.jit
    def jstep(state, batch):
        def loss_fn(params, bs):
            logits, mut = fm.apply(
                {"params": params, "batch_stats": bs}, batch["images"],
                train=True, mutable=["batch_stats"])
            total, aux = criterion(logits, batch)
            return total, (aux, mut["batch_stats"])

        (loss, (aux, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats)
        return state.apply_gradients(grads, new_bs), loss, aux

    t_losses, j_losses = [], []
    for it in range(steps):
        x, tgt, spx_b, spm, bits = batches[it % len(batches)]
        f = (1.0 - it / total) ** power
        opt.param_groups[0]["lr"] = max(lr * f, min_lr)
        opt.param_groups[1]["lr"] = max(lr * cls_scale * f, min_lr)

        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        opt.zero_grad()
        _, logits = tm(xt)
        tl, tce, tmc, tgr = torch_lossdecomp(
            torch, F, logits, torch.from_numpy(tgt),
            torch.from_numpy(spx_b.astype(np.int64)),
            torch.from_numpy(spm), nseg=S, coeff=coeff, coeff_mc=coeff_mc,
            coeff_gm=coeff_gm, t_mc=t_mc, t_gm=t_gm)
        tl.backward()
        opt.step()
        t_losses.append(float(tl))

        jb = {"images": jnp.asarray(x), "target": jnp.asarray(tgt),
              "spx": jnp.asarray(spx_b), "spmask": jnp.asarray(spm),
              "target_bits": jnp.asarray(bits)}
        state, jl, jaux = jstep(state, jb)
        j_losses.append(float(jl))
        if it % print_every == 0:
            print(f"step {it:4d}  torch {t_losses[-1]:.5f} "
                  f"(ce {float(tce):.4f} mc {float(tmc):.4f} "
                  f"g {float(tgr):.4f})  jax {j_losses[-1]:.5f} "
                  f"(ce {float(jaux['ce_loss']):.4f} "
                  f"mc {float(jaux['mc_loss']):.4f} "
                  f"g {float(jaux['group_loss']):.4f})")

    t = np.array(t_losses)
    j = np.array(j_losses)
    rel = np.abs(t - j) / np.maximum(np.abs(t), 1e-6)
    print(f"lossdecomp loss-curve relative gap: mean {rel.mean():.2e}  "
          f"max {rel.max():.2e}  final torch {t[-1]:.5f} jax {j[-1]:.5f}")
    return rel


def _force_cpu():
    # torch-vs-jax CPU comparison; also avoids fighting a concurrent TPU
    # job for the single-owner axon tunnel (plugin init fails then)
    import jax

    jax.config.update("jax_platforms", "cpu")


if __name__ == "__main__":
    _force_cpu()
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--criterion", choices=["ce", "lossdecomp"],
                    default="ce")
    args = ap.parse_args()
    if args.criterion == "lossdecomp":
        run_lossdecomp(steps=args.steps, lr=args.lr)
    else:
        run(steps=args.steps, lr=args.lr)
