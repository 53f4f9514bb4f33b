"""TPU bench for the stage-2 retrain step (dev tool).

Reference recipe (script/open_source/train_city_mul_res50.sh stage-2
block): per AL round, 80k iterations of plain CE (temp 0.1) on the saved
pseudo-label PNGs, batch 4 @768^2, C+1 classes, lr 4e-5 — the
`active_predignore` trainer (trainer/active_predignore.py:12-95). Same
measurement methodology as bench.py (K-step device scan, forced scalar
fetch). No group/MC terms, so this bounds the other half of the
projected round wall-clock in BASELINE.md.

Prints one JSON line {"metric", "value", "unit"}.
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

BATCH = 4
H = W = 768
NUM_CLASSES = 19  # +1 undefined (plbl PNGs store 255 -> C)
K = 32

if os.environ.get("MULACTSEG_BENCH_SMOKE", "0") == "1":
    BATCH, H, W, K = 2, 64, 64, 2


def main():
    from mulactseg_tpu.config import Config
    from mulactseg_tpu.engine.state import create_train_state
    from mulactseg_tpu.engine.train import make_train_step_scan
    from mulactseg_tpu.models import get_model

    cfg = Config(num_classes=NUM_CLASSES, crop_size=(H, W),
                 train_batch_size=BATCH, train_lr=4e-5, stage2=True,
                 method="active_predignore", dtype="bfloat16")
    model = get_model(cfg.model, num_classes=cfg.num_model_classes,
                      output_stride=cfg.output_stride, dtype=jnp.bfloat16)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               (BATCH, H, W, 3))
    run = make_train_step_scan(model, cfg, K, donate=True)

    rng = np.random.RandomState(0)
    labels = rng.randint(0, NUM_CLASSES + 1, (K, BATCH, H, W)).astype(
        np.int32)
    labels[:, :, : H // 8] = cfg.ignore_idx  # some ignore, like real plbl
    super_batch = {
        "images": jnp.asarray(rng.randn(K, BATCH, H, W, 3), jnp.bfloat16),
        "labels": jnp.asarray(labels),
    }
    key = jax.random.PRNGKey(0)

    key, k = jax.random.split(key)
    state, auxs = run(state, super_batch, k)
    _ = float(auxs["train_loss"][-1])  # forced fetch = real sync

    dispatches = 2
    t0 = time.perf_counter()
    for _ in range(dispatches):
        key, k = jax.random.split(key)
        state, auxs = run(state, super_batch, k)
    _ = float(auxs["train_loss"][-1])
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "cityscapes_stage2_train_throughput",
        "value": round(BATCH * K * dispatches / dt, 3),
        "unit": "images/sec/chip",
    }))


if __name__ == "__main__":
    main()
