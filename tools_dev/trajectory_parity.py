"""Optimization-trajectory parity: torch twin vs flax model, identical
init / batches / optimizer / schedule, N steps of CE training.

Validates the full optimizer semantics chain (trainer/base.py:64-76):
AdamW(b1=.9, b2=.999, eps=1e-8, weight_decay) with the classifier group
at cls_lr_scale x LR, PolyLR per iteration with a min floor
(utils/scheduler.py:4-13), train-mode BatchNorm with momentum 0.1 (torch
convention) and local batch statistics.

Run: python tools_dev/trajectory_parity.py [--steps 200]
Prints per-step losses every 20 steps and the max/mean relative gap.
tests/test_trajectory_parity.py asserts the same at 60 steps.
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
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
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


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()
    run(steps=args.steps, lr=args.lr)
