"""Headline benchmark: stage-1 Cityscapes training-step throughput.

Reference recipe (script/open_source/train_city_mul_res50.sh): batch 4,
768x768 crops, deeplabv3pluswn_resnet50deepstem with 20 output classes
(predignore), lossdecomp partial-label loss over nseg=2048 superpixels,
AdamW + poly. The reference runs this single-GPU in PyTorch; measured
community throughput for DeepLabV3+ R50 @768^2 fwd+bwd is ~10 img/s on an
RTX 3090 and ~25 img/s on an A100 — BASELINE.md carries no in-repo
numbers, so vs_baseline is computed against the A100 estimate
(REF_IMG_PER_S below) pending a measured baseline.

Measurement notes for this environment: the axon TPU tunnel has ~75 ms
per-dispatch latency and a non-blocking block_until_ready, so the bench
(like production training here) runs K optimizer steps per dispatch via
the device-side lax.scan loop (engine/train.py make_train_step_scan) and
forces a scalar fetch to time real completion.

Prints one JSON line per metric; the HEADLINE (stage-1 Cityscapes
throughput) is the LAST line, which is what the driver records. Before
it, secondary rows (VOC stage-1, Cityscapes stage-2, cosprop plbl) run
as subprocesses with individual timeouts so a cold compile on one can
never eat the headline; set MULACTSEG_BENCH_HEADLINE_ONLY=1 to skip
them in dev loops.
"""

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
# this jax build ignores the cache env var; the config knobs work
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

# Reference A100-chip throughput estimate. Provenance + a measured
# same-hardware calibration row (torch twin vs flax on this box's CPU at
# recipe shapes: JAX 1.55x faster) live in BASELINE.md "Measured numbers —
# reference". 25 img/s is the OPTIMISTIC ceiling for the reference (pure
# conv-stack community numbers, no partial-label loss loops), so
# vs_baseline below under-reports this framework if anything.
REF_IMG_PER_S = 25.0

BATCH = 4
H = W = 768
NSEG = 2048
NUM_CLASSES = 19  # +1 undefined
# steps per dispatch: the tunnel costs ~75 ms per (non-pipelining)
# dispatch, so K amortizes a real production knob (steps_per_dispatch);
# K=32 puts the residual dispatch overhead at ~2 ms/step
K = 32


# (secondary bench, per-bench subprocess timeout seconds) — warm runs are
# 1-3 min each; cold compiles can exceed the budget, in which case the row
# reports null and the headline still prints (the persistent compile cache
# makes the next invocation warm)
SECONDARY = [
    ("voc_stage1", [sys.executable, "tools_dev/bench_voc.py"], 900),
    ("cityscapes_stage2", [sys.executable, "tools_dev/bench_stage2.py"], 900),
    ("cosprop_plbl", [sys.executable, "tools_dev/bench_round.py", "plbl"],
     1200),
]


def run_secondary():
    root = os.path.dirname(os.path.abspath(__file__))
    for name, cmd, budget in SECONDARY:
        try:
            out = subprocess.run(
                cmd, cwd=root, timeout=budget, capture_output=True,
                text=True).stdout
            rows = [ln for ln in out.splitlines() if ln.startswith("{")]
            if not rows:
                raise RuntimeError("no JSON row")
            for ln in rows:
                print(ln, flush=True)
        except Exception as e:  # timeout / crash: report, keep going
            kind = type(e).__name__
            print(json.dumps({"metric": name, "value": None,
                              "unit": "images/sec/chip",
                              "note": f"secondary bench failed: {kind}"}),
                  flush=True)


def main():
    from mulactseg_tpu.config import Config
    from mulactseg_tpu.engine.state import create_train_state
    from mulactseg_tpu.engine.train import make_train_step_scan
    from mulactseg_tpu.models import get_model

    auto_layout = os.environ.get("MULACTSEG_AUTO_LAYOUT", "0") == "1"
    cfg = Config(num_classes=NUM_CLASSES, nseg=NSEG, crop_size=(H, W),
                 train_batch_size=BATCH,
                 method="active_joint_multi_predignore_lossdecomp",
                 dtype="bfloat16")
    model = get_model(cfg.model, num_classes=cfg.num_model_classes,
                      output_stride=cfg.output_stride, dtype=jnp.bfloat16)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               (BATCH, H, W, 3))
    run = make_train_step_scan(model, cfg, K, donate=True,
                               auto_layout=auto_layout)

    from mulactseg_tpu.data.synthetic import irregular_superpixels
    from mulactseg_tpu.losses.fused import pixel_target_bits

    rng = np.random.RandomState(0)
    target = (rng.rand(K, BATCH, NSEG, NUM_CLASSES + 1) < 0.15).astype(
        np.float32)
    # contiguous irregular superpixels + whole-superpixel selection masks:
    # the run structure of real SEEDS maps (which the segment engine's
    # raster-block pre-reduction exploits); a per-pixel random map would
    # benchmark a workload that never occurs
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
    # no spmask: the fused lossdecomp path folds selection into the bits,
    # and the production dispatch (engine/rounds.ship_keys) drops it
    super_batch = {
        "images": jnp.asarray(rng.randn(K, BATCH, H, W, 3), jnp.bfloat16),
        "target": jnp.asarray(target),
        "target_bits": jnp.asarray(bits),
        "spx": jnp.asarray(spx),
    }
    del spmask
    key = jax.random.PRNGKey(0)

    if auto_layout:
        # compile with XLA-chosen entry layouts, then place every operand
        # in exactly the layout the loop wants — kills the per-step
        # relayout of the sliced xs slabs inside the scan
        compiled = run.lower(state, super_batch, key).compile()
        (fmt_state, fmt_batch, fmt_key), _ = compiled.input_formats
        state = jax.device_put(state, fmt_state)
        super_batch = jax.device_put(super_batch, fmt_batch)

        def run(state, batch, k):
            return compiled(state, batch, jax.device_put(k, fmt_key))

    # warmup / compile
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

    img_per_s = BATCH * K * dispatches / dt
    print(json.dumps({
        "metric": "cityscapes_stage1_train_throughput",
        "value": round(img_per_s, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_s / REF_IMG_PER_S, 3),
    }))


if __name__ == "__main__":
    if os.environ.get("MULACTSEG_BENCH_HEADLINE_ONLY", "0") != "1":
        run_secondary()
    main()
