"""TPU bench for the VOC stage-1 recipe (dev tool; bench.py stays the
driver's Cityscapes headline).

Reference recipe (script/open_source/train_voc_mul_res50.sh): batch 12,
513x513 crops, deeplabv3pluswn_resnet50deepstem with 21 classes (VOC has
no predignore class), lossdecomp partial-label loss over nseg=150
superpixels (seeds_32), lr 1e-5, 30k iters. 513 is odd, so H*W is not a
multiple of the pixel-CE Pallas chunk — this bench deliberately exercises
the row-major fallback kernels the real VOC path hits.

Prints one JSON line {"metric", "value", "unit"}; record in BASELINE.md.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

BATCH = 12
H = W = 513
NSEG = 150
NUM_CLASSES = 21
K = 8  # batch 12 superbatches are big; K=8 keeps HBM modest (~9.5 MB/img)

if os.environ.get("MULACTSEG_BENCH_SMOKE", "0") == "1":
    # correctness smoke on CPU: same code path, toy shapes (65 stays odd)
    BATCH, H, W, NSEG, K = 2, 65, 65, 16, 2


def main():
    from mulactseg_tpu.config import Config
    from mulactseg_tpu.data.synthetic import irregular_superpixels
    from mulactseg_tpu.engine.state import create_train_state
    from mulactseg_tpu.engine.train import make_train_step_scan
    from mulactseg_tpu.losses.fused import pixel_target_bits
    from mulactseg_tpu.models import get_model

    cfg = Config(dataset="voc", num_classes=NUM_CLASSES, nseg=NSEG,
                 small_nseg=600, crop_size=(H, W), train_batch_size=BATCH,
                 train_lr=1e-5, method="active_joint_multi_lossdecomp",
                 dtype="bfloat16")
    model = get_model(cfg.model, num_classes=cfg.num_model_classes,
                      output_stride=cfg.output_stride, dtype=jnp.bfloat16)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               (BATCH, H, W, 3))
    run = make_train_step_scan(model, cfg, K, donate=True)

    rng = np.random.RandomState(0)
    target = (rng.rand(K, BATCH, NSEG, NUM_CLASSES) < 0.15).astype(
        np.float32)
    spx = np.stack([
        np.stack([irregular_superpixels(H, W, NSEG, rng)
                  for _ in range(BATCH)]) for _ in range(K)]).astype(np.int32)
    sel = rng.rand(K, BATCH, NSEG) < 0.5
    spmask = np.take_along_axis(
        sel.reshape(K, BATCH, NSEG),
        spx.reshape(K, BATCH, H * W), axis=2).reshape(K, BATCH, H, W)
    bits = np.stack([
        np.stack([pixel_target_bits(target[k, b], spx[k, b], spmask[k, b])
                  for b in range(BATCH)]) for k in range(K)])
    super_batch = {
        "images": jnp.asarray(rng.randn(K, BATCH, H, W, 3), jnp.bfloat16),
        "target": jnp.asarray(target),
        "target_bits": jnp.asarray(bits),
        "spx": jnp.asarray(spx),
    }
    key = jax.random.PRNGKey(0)

    key, k = jax.random.split(key)
    state, auxs = run(state, super_batch, k)
    _ = float(auxs["train_loss"][-1])  # forced fetch = real sync

    dispatches = 4
    t0 = time.perf_counter()
    for _ in range(dispatches):
        key, k = jax.random.split(key)
        state, auxs = run(state, super_batch, k)
    _ = float(auxs["train_loss"][-1])
    dt = time.perf_counter() - t0

    img_per_s = BATCH * K * dispatches / dt
    print(json.dumps({
        "metric": "voc_stage1_train_throughput",
        "value": round(img_per_s, 3),
        "unit": "images/sec/chip",
    }))


if __name__ == "__main__":
    main()
