"""Same-hardware baseline calibration: the reference's torch model vs the
flax flagship at recipe shapes, fwd+bwd, on this box's CPU.

The reference repo ships no benchmark numbers (BASELINE.md), its recipe
hardware is an RTX 3090 (SLURM headers), and this box has no GPU — so
the only measurement we can make locally is a same-CPU ratio between:
  (a) a full-scale torch twin of deeplabv3pluswn_resnet50deepstem
      (the from-scratch parity-test model of tests/test_full_model_parity,
      widened to paper widths: R50-deepstem layers 3/4/6/3, stem 64,
      head 48/256, 20 classes) with fwd+bwd of a mean-CE surrogate loss
      — a LOWER bound for a reference step, which additionally runs the
      per-image torch_scatter loss loops; and
  (b) the flax flagship with the same surrogate, jitted on CPU.

Usage: python tools_dev/bench_baseline.py [--steps 2] [--hw 384]
Prints one JSON line per framework plus the ratio.
"""

import argparse
import json
import time


def bench_torch(B, H, W, steps):
    import torch
    import torch.nn.functional as F

    import sys
    sys.path.insert(0, ".")
    from tests.test_backbone_parity import TorchResNetStem
    from tests.test_full_model_parity import TorchWNHead

    torch.set_num_threads(1)

    class FullTorchDeepLab(torch.nn.Module):
        def __init__(self, num_classes=20):
            super().__init__()
            self.backbone = TorchResNetStem(
                layers=(3, 4, 6, 3), stem_width=64,
                dilate=(False, False, True),
                planes=(64, 128, 256, 512))
            self.classifier = TorchWNHead(2048, 256, num_classes,
                                          (6, 12, 18), cout=256)
            # paper low-level projection is 48ch; TorchWNHead defaults the
            # projection to 12 — rebuild at 48 to match model FLOPs
            self.classifier.project = torch.nn.Sequential(
                torch.nn.Conv2d(256, 48, 1, bias=False),
                torch.nn.BatchNorm2d(48), torch.nn.ReLU())
            self.classifier.classifier = torch.nn.Sequential(
                torch.nn.Conv2d(256 + 48, 256, 3, padding=1, bias=False),
                torch.nn.BatchNorm2d(256), torch.nn.ReLU(),
                torch.nn.Conv2d(256, 256, 3, padding=1, bias=False),
                torch.nn.BatchNorm2d(256), torch.nn.ReLU())

        def forward(self, x):
            size = x.shape[-2:]
            low, out = self.backbone(x)
            _, logits = self.classifier({"low_level": low, "out": out})
            return F.interpolate(logits, size=size, mode="bilinear",
                                 align_corners=False)

    model = FullTorchDeepLab()
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=2e-5)
    x = torch.randn(B, 3, H, W)
    y = torch.randint(0, 20, (B, H, W))

    def step():
        opt.zero_grad()
        logits = model(x)
        loss = F.cross_entropy(logits, y)
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = (time.perf_counter() - t0) / steps
    return dt


def bench_jax(B, H, W, steps):
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from mulactseg_tpu.models import get_model

    model = get_model("deeplabv3pluswn_resnet50deepstem", num_classes=20,
                      output_stride=16, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, 3), jnp.float32)
    y = jnp.asarray(rng.randint(0, 20, (B, H, W)), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    tx = optax.adamw(2e-5)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, batch_stats, opt_state, x, y):
        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)})
            ll = jax.nn.log_softmax(logits, -1)
            loss = -jnp.mean(jnp.take_along_axis(ll, y[..., None], -1))
            return loss, mut["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), bs, opt_state, loss

    params, batch_stats = variables["params"], variables["batch_stats"]
    params, batch_stats, opt_state, loss = step(params, batch_stats,
                                                opt_state, x, y)
    float(loss)  # warmup + compile
    t0 = time.perf_counter()
    for _ in range(steps):
        params, batch_stats, opt_state, loss = step(params, batch_stats,
                                                    opt_state, x, y)
    float(loss)
    dt = (time.perf_counter() - t0) / steps
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--hw", type=int, default=384,
                    help="square input size (768 = recipe, slow on 1 CPU)")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--skip-jax", action="store_true")
    ap.add_argument("--skip-torch", action="store_true")
    args = ap.parse_args()

    out = {"batch": args.batch, "hw": args.hw, "steps": args.steps}
    if not args.skip_torch:
        dt = bench_torch(args.batch, args.hw, args.hw, args.steps)
        out["torch_cpu_s_per_step"] = round(dt, 3)
        out["torch_cpu_img_per_s"] = round(args.batch / dt, 4)
    if not args.skip_jax:
        dt = bench_jax(args.batch, args.hw, args.hw, args.steps)
        out["jax_cpu_s_per_step"] = round(dt, 3)
        out["jax_cpu_img_per_s"] = round(args.batch / dt, 4)
    if "torch_cpu_s_per_step" in out and "jax_cpu_s_per_step" in out:
        out["jax_over_torch_speedup"] = round(
            out["torch_cpu_s_per_step"] / out["jax_cpu_s_per_step"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
