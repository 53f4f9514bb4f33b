"""Op-level TPU trace of the plbl device path (dev tool).

profile_plbl.py gives the stage split (feat_fwd ~320 ms, cos_kernel
~360 ms); this breaks the cosine kernel + feature forward into HLO
fusion costs via jax.profiler, reusing profile_step.report. The matmul
roofline for the two similarity passes is ~30-60 ms, so most of the
measured kernel time is elsewhere (lexsort over 2M pixels,
segment_max_grad, gathers) — this names it.

Run: python tools_dev/profile_plbl_ops.py [--trace-dir /tmp/profile_plbl]
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

H, W, NSEG, C = 1024, 2048, 2048, 19


def main(trace_dir):
    from tools_dev.bench_round import _model_and_state
    from tools_dev.profile_step import report
    from mulactseg_tpu.data.synthetic import irregular_superpixels
    from mulactseg_tpu.plbl.generator import PseudoLabelGenerator

    cfg, model, state = _model_and_state()
    gen = PseudoLabelGenerator(model, cfg,
                               plbl_type="cosprop_includeonehot")
    rng = np.random.RandomState(0)
    print("# building fixture...", file=sys.stderr, flush=True)
    spx = irregular_superpixels(H, W, NSEG, rng)
    sel = np.nonzero(rng.rand(NSEG) < 0.3)[0]
    tgt = (rng.rand(NSEG, C + 1) < 0.1).astype(np.float32)
    tgt[np.arange(NSEG), rng.randint(0, C + 1, NSEG)] = 1.0
    batch = {
        "images": rng.randn(1, H, W, 3).astype(np.float32),
        "labels": rng.randint(0, C, (1, H, W)).astype(np.uint8),
        "target": tgt[None], "spx": spx[None],
        "spmask": np.isin(spx, sel)[None],
        "fnames": [["img", "lbl_0.png", "spx_0"]],
    }
    suppix = {"spx_0": sel.tolist()[:600]}

    import jax.numpy as jnp

    prep = gen.host_prep(batch, suppix)
    dev = gen._fused_args([batch], [prep])
    cm0 = jnp.zeros((C + 1, C + 1), jnp.int32)

    def run(cm):
        return gen._fused_step(state.params, state.batch_stats,
                               dev["images"], dev["spx_flat"],
                               dev["pv_packed"], dev["proto_sid"],
                               dev["proto_cls"], dev["proto_valid"],
                               dev["adj_packed"], dev["labels"], cm)

    print("# compiling/warming...", file=sys.stderr, flush=True)
    u8, cm = run(cm0)
    _ = int(np.asarray(u8)[0, 0])

    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        u8, cm = run(cm)
        _ = int(np.asarray(u8)[0, 0])
    report(trace_dir, 1)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/profile_plbl_ops")
    main(ap.parse_args().trace_dir)
