"""Stage-level profile of cosine-prototype plbl generation on the TPU.

Breaks the 1024x2048 cosprop_includeonehot per-image cost (bench_round.py
plbl: ~1.02 s/image at round 3) into:
  host_prep     adjacency + prototype tables (numpy, one CPU core)
  feat_fwd      eval forward with return_feat (dispatch + device)
  cos_kernel    cosine_prototype_plbl (dispatch + device)
  fetch         device->host transfer of the (H, W) plbl map
  iou           MeanIoU confusion-matrix accumulation (host)
  generate      the real pipelined generate() loop per image

Timing convention for this tunnel: dispatch latency ~75 ms, chained
dispatches do NOT pipeline, and block_until_ready does not block — every
device stage is timed by fetching a scalar from its result.

Run: python tools_dev/profile_plbl.py [--n 4]
"""

import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

sys.path.insert(0, ".")

H, W, NSEG, C = 1024, 2048, 2048, 19


def main(n_images=4):
    from tools_dev.bench_round import _model_and_state
    from mulactseg_tpu.data.synthetic import irregular_superpixels
    from mulactseg_tpu.plbl.generator import PseudoLabelGenerator
    from mulactseg_tpu.utils.metrics import MeanIoU

    cfg, model, state = _model_and_state()
    gen = PseudoLabelGenerator(model, cfg,
                               plbl_type="cosprop_includeonehot")

    rng = np.random.RandomState(0)
    print("# building fixture...", file=sys.stderr, flush=True)
    base_spx = [irregular_superpixels(H, W, NSEG, rng) for _ in range(2)]
    batches = []
    for i in range(n_images):
        spx = base_spx[i % 2]
        sel = np.nonzero(rng.rand(NSEG) < 0.3)[0]
        spmask = np.isin(spx, sel)
        tgt = (rng.rand(NSEG, C + 1) < 0.1).astype(np.float32)
        tgt[np.arange(NSEG), rng.randint(0, C + 1, NSEG)] = 1.0
        batches.append({
            "images": rng.randn(1, H, W, 3).astype(np.float32),
            "labels": rng.randint(0, C, (1, H, W)).astype(np.uint8),
            "target": tgt[None],
            "spx": spx[None],
            "spmask": spmask[None],
            "fnames": [["img", f"lbl_{i}.png", f"spx_{i}"]],
        })
    suppix = {f"spx_{i}": np.nonzero(
        np.isin(np.arange(NSEG), np.unique(b["spx"])))[0].tolist()[:600]
        for i, b in enumerate(batches)}

    rows = {}

    def stamp(name, dt, per="image"):
        rows[name] = dt
        print(json.dumps({"stage": name, "ms_per_image": round(dt * 1e3, 1)}),
              flush=True)

    # -- host_prep ----------------------------------------------------------
    preps = [gen.host_prep(b, suppix) for b in batches]  # warm numpy
    t0 = time.perf_counter()
    preps = [gen.host_prep(b, suppix) for b in batches]
    stamp("host_prep", (time.perf_counter() - t0) / n_images)

    # -- feat forward (one image in flight: a full-res feat tensor is
    # ~2.1 GB — holding n at once OOMs the 16 GB chip) --------------------
    imgs = [jnp.asarray(b["images"]) for b in batches]
    f, lg = gen._feat_step(state.params, state.batch_stats, imgs[0])
    _ = float(jnp.sum(lg))  # compile + warm
    del f, lg
    dt = 0.0
    for x in imgs:
        t0 = time.perf_counter()
        o = gen._feat_step(state.params, state.batch_stats, x)
        _ = float(jnp.sum(o[1][0, 0, 0]))
        dt += time.perf_counter() - t0
        del o
    stamp("feat_fwd", dt / n_images)

    # -- cosine kernel ------------------------------------------------------
    from mulactseg_tpu.plbl.cosine_prop import cosine_prototype_plbl

    def kern(feat, probs_src, prep, spx_map):
        targets, spmask, psid, pcls, pvalid, padj, pixel_valid = prep
        probs = jax.nn.softmax(probs_src[0].astype(jnp.float32), axis=-1)
        return cosine_prototype_plbl(
            feat[0].reshape(-1, feat.shape[-1]),
            probs.reshape(-1, probs.shape[-1]),
            jnp.asarray(spx_map.reshape(-1)), jnp.asarray(pixel_valid),
            jnp.asarray(psid), jnp.asarray(pcls), jnp.asarray(pvalid),
            jnp.asarray(padj), nseg=cfg.nseg)

    spx_maps = [np.asarray(b["spx"][0]) for b in batches]
    o = gen._feat_step(state.params, state.batch_stats, imgs[0])
    _ = int(kern(o[0], o[1], preps[0], spx_maps[0])[0])  # compile + warm
    del o
    dt = 0.0
    pls = []
    for x, p, s in zip(imgs, preps, spx_maps):
        o = gen._feat_step(state.params, state.batch_stats, x)
        _ = float(jnp.sum(o[1][0, 0, 0]))  # feat settled, untimed
        t0 = time.perf_counter()
        pl = kern(o[0], o[1], p, s)
        _ = int(pl[0])
        dt += time.perf_counter() - t0
        del o
        pls.append(pl)
    stamp("cos_kernel", dt / n_images)

    # -- fetch --------------------------------------------------------------
    t0 = time.perf_counter()
    plbl_np = [np.asarray(p).astype(np.uint8) for p in pls]
    stamp("fetch", (time.perf_counter() - t0) / n_images)

    # -- iou ----------------------------------------------------------------
    iou = MeanIoU(cfg.num_classes + 1, cfg.ignore_idx)
    t0 = time.perf_counter()
    for p, b in zip(plbl_np, batches):
        iou._after_step({"outputs": p.reshape(1, H, W),
                         "targets": np.asarray(b["labels"])})
    stamp("iou", (time.perf_counter() - t0) / n_images)

    # -- full generate loop -------------------------------------------------
    gen.generate(state.params, state.batch_stats, [batches[0]],
                 suppix=suppix)  # warm all shapes
    t0 = time.perf_counter()
    gen.generate(state.params, state.batch_stats, batches, suppix=suppix)
    stamp("generate", (time.perf_counter() - t0) / n_images)

    acc = sum(v for k, v in rows.items() if k != "generate")
    print(json.dumps({"stage": "sum_of_stages",
                      "ms_per_image": round(acc * 1e3, 1)}), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4)
    main(ap.parse_args().n)
