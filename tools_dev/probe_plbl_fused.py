"""Probe: where does the per-image plbl time go — host->device transfer,
dispatch latency, or device compute — for the fused one-dispatch path vs
the unfused chain (dev tool).

Timing convention for this tunnel: block_until_ready does not block;
every measurement fetches a scalar from the result.

Run: python tools_dev/probe_plbl_fused.py
"""

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

H, W, NSEG, C = 1024, 2048, 2048, 19
N = 4


def fetch(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    from tools_dev.bench_round import _model_and_state
    from mulactseg_tpu.data.synthetic import irregular_superpixels
    from mulactseg_tpu.plbl.generator import PseudoLabelGenerator

    cfg, model, state = _model_and_state()
    gen = PseudoLabelGenerator(model, cfg, plbl_type="cosprop_includeonehot")
    rng = np.random.RandomState(0)
    print("# fixture...", file=sys.stderr, flush=True)
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
    prep = gen.host_prep(batch, suppix)
    (_tg, _sm, proto_sid, proto_cls, proto_valid, proto_adj,
     pixel_valid) = prep

    host_args = dict(
        images=batch["images"].astype(np.float32),
        spx_flat=spx.reshape(-1).astype(np.int32),
        pixel_valid=pixel_valid, proto_sid=proto_sid, proto_cls=proto_cls,
        proto_valid=proto_valid, proto_adj=proto_adj,
        labels=np.asarray(batch["labels"]),
    )
    nbytes = sum(v.nbytes for v in host_args.values())
    print(f"# arg bytes/image: {nbytes/1e6:.1f} MB", file=sys.stderr)

    # (a) transfer alone
    for trial in range(2):
        t0 = time.perf_counter()
        dev = {k: jax.device_put(v) for k, v in host_args.items()}
        s = sum(fetch(v) for v in dev.values())
        dt = time.perf_counter() - t0
        print(f"transfer(+fetch-sync) trial{trial}: {dt*1000:.0f} ms")

    cm0 = jnp.zeros((C + 2, C + 2), jnp.int32)  # num_classes+1 = 20
    cm0 = jnp.zeros((cfg.num_classes + 1, cfg.num_classes + 1), jnp.int32)

    # (b) fused with device-resident args
    def run_fused(args, cm):
        return gen._fused_step(state.params, state.batch_stats,
                               args["images"], args["spx_flat"],
                               args["pixel_valid"], args["proto_sid"],
                               args["proto_cls"], args["proto_valid"],
                               args["proto_adj"], args["labels"], cm)

    u8, cm = run_fused(dev, cm0)
    _ = fetch(u8)
    dev = {k: jax.device_put(v) for k, v in host_args.items()}
    for trial in range(3):
        cm = jnp.zeros((cfg.num_classes + 1, cfg.num_classes + 1), jnp.int32)
        t0 = time.perf_counter()
        for _i in range(N):
            u8, cm = run_fused(dev, cm)
        _ = fetch(u8)
        dt = time.perf_counter() - t0
        print(f"fused xN dev-args trial{trial}: {dt/N*1000:.0f} ms/img")

    # (c) fused with host args (transfer inside the call)
    for trial in range(2):
        cm = jnp.zeros((cfg.num_classes + 1, cfg.num_classes + 1), jnp.int32)
        t0 = time.perf_counter()
        for _i in range(N):
            u8, cm = run_fused(host_args, cm)
        _ = fetch(u8)
        dt = time.perf_counter() - t0
        print(f"fused xN host-args trial{trial}: {dt/N*1000:.0f} ms/img")

    # (d) unfused chain with host args (the old path)
    gen2 = PseudoLabelGenerator(model, cfg, plbl_type="cosprop_includeonehot")
    gen2._fused_step = None
    from mulactseg_tpu.utils.metrics import MeanIoU
    plbl, _sm = gen2.plbl_for_batch(state.params, state.batch_stats, batch,
                                    suppix, prep=prep)
    _ = fetch(plbl)
    for trial in range(2):
        iou = MeanIoU(cfg.num_classes + 1, cfg.ignore_idx)
        t0 = time.perf_counter()
        for _i in range(N):
            plbl, _sm = gen2.plbl_for_batch(state.params, state.batch_stats,
                                            batch, suppix, prep=prep)
            u8 = iou._after_step_device_u8(plbl, batch["labels"])
        _ = fetch(u8)
        dt = time.perf_counter() - t0
        print(f"unfused xN host-args trial{trial}: {dt/N*1000:.0f} ms/img")


if __name__ == "__main__":
    main()
