"""Profile the stage-1 train step on the TPU and print a per-fusion cost
table parsed from the trace (dev tool; run: python tools_dev/profile_step.py
[composed|fused]). Uses the same shapes as bench.py."""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
# this jax build ignores the cache env var; the config knobs work
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

BATCH, H, W, NSEG, C = 4, 768, 768, 2048, 19
K = int(os.environ.get("PROF_K", "8"))


def main(mode="fused"):
    from mulactseg_tpu.config import Config
    from mulactseg_tpu.engine.state import create_train_state
    from mulactseg_tpu.engine.train import make_train_step_scan
    from mulactseg_tpu.models import get_model
    from mulactseg_tpu.losses.fused import pixel_target_bits

    cfg = Config(num_classes=C, nseg=NSEG, crop_size=(H, W),
                 train_batch_size=BATCH,
                 method="active_joint_multi_predignore_lossdecomp",
                 dtype="bfloat16")
    model = get_model(cfg.model, num_classes=cfg.num_model_classes,
                      output_stride=cfg.output_stride, dtype=jnp.bfloat16)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               (BATCH, H, W, 3))
    run = make_train_step_scan(model, cfg, K, donate=True)

    rng = np.random.RandomState(0)
    target = (rng.rand(K, BATCH, NSEG, C + 1) < 0.15).astype(np.float32)
    from mulactseg_tpu.data.synthetic import irregular_superpixels
    spx = np.stack([np.stack([irregular_superpixels(H, W, NSEG, rng)
                    for _ in range(BATCH)]) for _ in range(K)]).astype(np.int32)
    sel = rng.rand(K, BATCH, NSEG) < 0.5
    spmask = np.take_along_axis(sel, spx.reshape(K, BATCH, -1),
                                axis=2).reshape(K, BATCH, H, W)
    super_batch = {
        "images": jnp.asarray(rng.randn(K, BATCH, H, W, 3), jnp.float32),
        "target": jnp.asarray(target),
        "spx": jnp.asarray(spx),
        "spmask": jnp.asarray(spmask),
    }
    if mode == "fused":
        bits = np.stack([
            np.stack([pixel_target_bits(target[k, b], spx[k, b],
                                        spmask[k, b])
                      for b in range(BATCH)]) for k in range(K)])
        super_batch["target_bits"] = jnp.asarray(bits)
    key = jax.random.PRNGKey(0)

    key, k = jax.random.split(key)
    state, auxs = run(state, super_batch, k)
    _ = float(auxs["train_loss"][-1])

    trace_dir = f"/tmp/profile_{mode}"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        key, k = jax.random.split(key)
        state, auxs = run(state, super_batch, k)
        _ = float(auxs["train_loss"][-1])

    report(trace_dir, K)


def report(trace_dir, K):
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace under {trace_dir}"
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    pids, tids = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pids[e["pid"]] = e["args"].get("name", "")
            if e.get("name") == "thread_name":
                tids[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    by_src = defaultdict(float)
    by_cat = defaultdict(float)
    whiles = defaultdict(float)
    flops = 0.0
    conv_ms = 0.0
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if tids.get((e.get("pid"), e.get("tid"))) != "XLA Ops":
            continue
        if "TPU" not in pids.get(e.get("pid"), ""):
            continue
        name = e.get("name", "")
        args = e.get("args", {}) or {}
        cat = args.get("hlo_category", "?")
        dur = e.get("dur", 0) / 1e3
        src = args.get("source", "?")
        if cat == "while" or name.startswith("jit_") or name == "2":
            whiles[f"{name} @ {src}"] += dur
            continue
        total += dur
        by_cat[cat] += dur
        by_src[f"{cat:28s} {src}"] += dur
        if "convolution" in cat:
            conv_ms += dur
            flops += float(args.get("model_flops", 0) or 0)
    print(f"== leaf device time {total / K:.1f} ms/step over {K} steps")
    if conv_ms:
        print(f"== conv fusions: {conv_ms / K:.1f} ms/step, "
              f"{flops / (conv_ms / 1e3) / 1e12:.1f} TFLOP/s sustained")
    print("-- by category --")
    for kk, v in sorted(by_cat.items(), key=lambda x: -x[1])[:16]:
        print(f"{v / K:8.2f} ms/step  {kk}")
    print("-- by source --")
    for kk, v in sorted(by_src.items(), key=lambda x: -x[1])[:30]:
        print(f"{v / K:8.2f} ms/step  {kk}")
    print("-- while parents (serial loops; bodies counted above) --")
    for kk, v in sorted(whiles.items(), key=lambda x: -x[1])[:8]:
        print(f"{v / K:8.2f} ms/step  {kk}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "fused")
