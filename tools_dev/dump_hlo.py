"""Dump notable ops from the compiled stage-1 scan step (dev tool).

Compiles the same program as tools_dev/profile_step.py and prints the
HLO lines for op kinds that showed up hot in the trace (dynamic-update-
slice, transpose/copy 'data formatting', big pads), with byte sizes, so
the trace categories can be attributed to actual tensors.

Run: python tools_dev/dump_hlo.py [kinds-regex]
"""

import os
import re
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

BATCH, H, W, NSEG, C = 4, 768, 768, 2048, 19
K = 8

DT_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "s8": 1,
            "u8": 1, "f16": 2, "s64": 8}


def shape_bytes(text):
    total = 0
    for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", text):
        if dt not in DT_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DT_BYTES[dt]
    return total


def main(kinds=r"dynamic-update-slice|transpose|copy\(|pad\("):
    from mulactseg_tpu.config import Config
    from mulactseg_tpu.engine.state import create_train_state
    from mulactseg_tpu.engine.train import make_train_step_scan
    from mulactseg_tpu.models import get_model

    cfg = Config(num_classes=C, nseg=NSEG, crop_size=(H, W),
                 train_batch_size=BATCH,
                 method="active_joint_multi_predignore_lossdecomp",
                 dtype="bfloat16")
    model = get_model(cfg.model, num_classes=cfg.num_model_classes,
                      output_stride=cfg.output_stride, dtype=jnp.bfloat16)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               (BATCH, H, W, 3))
    run = make_train_step_scan(model, cfg, K, donate=False)

    super_batch = {
        "images": jax.ShapeDtypeStruct((K, BATCH, H, W, 3), jnp.float32),
        "target": jax.ShapeDtypeStruct((K, BATCH, NSEG, C + 1), jnp.float32),
        "spx": jax.ShapeDtypeStruct((K, BATCH, H, W), jnp.int32),
        "spmask": jax.ShapeDtypeStruct((K, BATCH, H, W), jnp.bool_),
        "target_bits": jax.ShapeDtypeStruct((K, BATCH, H, W), jnp.int32),
    }
    lowered = run.lower(state, super_batch,
                        jax.ShapeDtypeStruct((2,), jnp.uint32))
    txt = lowered.compile().as_text()
    pat = re.compile(kinds)
    rows = []
    for line in txt.splitlines():
        ls = line.strip()
        if not pat.search(ls):
            continue
        b = shape_bytes(ls.split(" = ", 1)[0] if " = " in ls else ls)
        rows.append((b, ls[:400]))
    rows.sort(reverse=True)
    for b, ls in rows[:60]:
        print(f"{b/1e6:10.1f} MB  {ls}")


if __name__ == "__main__":
    main(*(sys.argv[1:2] or []))
