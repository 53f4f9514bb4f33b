"""TPU benches for the non-training hot loops of an AL round (dev tool):

  score  pool-scoring sweep — the paper selector's per-image device work
         (my_bvsb_predclsbal_pwr_banignore: pass-1 mean softmax + pass-2
         weighted region BvSB + votes) at the eval shape the pool loader
         uses (1024x2048, batch 1)
  plbl   cosine-prototype pseudo-label generation at 1024x2048 via the
         REAL PseudoLabelGenerator.generate() loop (forward + prototype
         kernel + pipelined host adjacency), vs the reference's slowest
         component (eval_save_cosplbl_prop.py:121-313 double Python loop)

Run: python tools_dev/bench_round.py [score|plbl|all]
Each section prints one JSON line {"metric", "value", "unit"}. Results
are recorded in BASELINE.md; bench.py stays the driver's single-line
headline bench.
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

H, W = 1024, 2048
NSEG = 2048
C = 19

N_IMAGES = 4  # distinct synthetic images cycled through the loops


def _model_and_state():
    from mulactseg_tpu.config import Config
    from mulactseg_tpu.engine.state import create_train_state
    from mulactseg_tpu.models import get_model

    cfg = Config(num_classes=C, nseg=NSEG, crop_size=(768, 768),
                 method="active_joint_multi_predignore_lossdecomp",
                 dtype="bfloat16")
    model = get_model(cfg.model, num_classes=cfg.num_model_classes,
                      output_stride=cfg.output_stride, dtype=jnp.bfloat16)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               (1, 512, 512, 3))
    return cfg, model, state


def _images(rng, n):
    return [rng.randn(1, H, W, 3).astype(np.float32) for _ in range(n)]


def bench_score(batch_sizes=(1, 2, 4)):
    """Per-launch (executable dispatch) overhead on this tunnel is ~75 ms
    even when calls are queued back-to-back, so val_batch_size is the
    amortization lever — sweep it and report one row per batch size."""
    from mulactseg_tpu.acquisition import scoring
    from mulactseg_tpu.data.synthetic import irregular_superpixels

    cfg, model, state = _model_and_state()
    fwd = jax.jit(lambda p, bs, x: model.apply(
        {"params": p, "batch_stats": bs}, x, train=False))

    rng = np.random.RandomState(0)
    print("# building fixture...", file=sys.stderr, flush=True)
    raw = _images(rng, N_IMAGES)
    base_spx = [irregular_superpixels(H, W, NSEG, rng) for _ in range(2)]
    raw_spx = [base_spx[i % 2] for i in range(N_IMAGES)]
    print("# fixture done", file=sys.stderr, flush=True)
    cls_weight = jnp.ones((C + 1,), jnp.float32)

    @jax.jit
    def pass1(p, bs, x):
        return scoring.mean_softmax(fwd(p, bs, x), cfg.ce_temp)

    @jax.jit
    def pass2(p, bs, x, spx):
        lg = fwd(p, bs, x)
        return scoring.region_weighted_bvsb_and_votes(
            lg, spx, cls_weight, nseg=NSEG, temp=cfg.ce_temp)

    best = 0.0
    for B in batch_sizes:
        imgs = [jnp.asarray(np.concatenate(raw[i:i + B]), jnp.bfloat16)
                for i in range(0, N_IMAGES, B)]
        spxs = [jnp.asarray(np.stack(raw_spx[i:i + B]))
                for i in range(0, N_IMAGES, B)]
        # compile + warm
        m = pass1(state.params, state.batch_stats, imgs[0])
        r, v = pass2(state.params, state.batch_stats, imgs[0], spxs[0])
        _ = float(jnp.sum(m)) + float(jnp.sum(r)) + float(jnp.sum(v))

        t0 = time.perf_counter()
        acc = None
        for x in imgs:
            m = pass1(state.params, state.batch_stats, x)
            acc = m if acc is None else acc + m
        outs = [pass2(state.params, state.batch_stats, x, s)
                for x, s in zip(imgs, spxs)]
        _ = float(jnp.sum(acc)) + sum(
            float(jnp.sum(r)) + float(jnp.sum(v)) for r, v in outs)
        dt = time.perf_counter() - t0
        # one full selector sweep = 2 passes over the pool; report per pool
        # image (both passes included), matching how a round consumes it
        img_per_s = N_IMAGES / dt
        best = max(best, img_per_s)
        print(json.dumps({"metric": f"pool_scoring_throughput_b{B}",
                          "value": round(img_per_s, 3),
                          "unit": "pool-images/sec/chip (both passes)"}))
    return best


def bench_plbl():
    from mulactseg_tpu.config import Config
    from mulactseg_tpu.data.synthetic import irregular_superpixels
    from mulactseg_tpu.plbl.generator import PseudoLabelGenerator

    cfg, model, state = _model_and_state()
    gen = PseudoLabelGenerator(model, cfg,
                               plbl_type="cosprop_includeonehot")

    # 8 images (vs N_IMAGES=4 for score): generate() is a 3-thread
    # pipeline whose fill/drain edges (~0.45 s) would skew a 4-image
    # run by ~25%; a real round streams 2975 images, so the sustained
    # rate is the honest number
    n_images = int(os.environ.get("PLBL_N", "8"))
    rng = np.random.RandomState(0)
    print("# building fixture...", file=sys.stderr, flush=True)
    base_spx = [irregular_superpixels(H, W, NSEG, rng) for _ in range(2)]
    batches = []
    for i in range(n_images):
        spx = base_spx[i % 2]
        sel = np.nonzero(rng.rand(NSEG) < 0.3)[0]
        spmask = np.isin(spx, sel)
        # 1-3 candidate classes per superpixel, vectorized
        tgt = (rng.rand(NSEG, C + 1) < 0.1).astype(np.float32)
        tgt[np.arange(NSEG), rng.randint(0, C + 1, NSEG)] = 1.0
        batches.append({
            # uint8 on the wire, as the production loader ships it
            # (EvalRegionDatasetAll emit_u8=True); the fused step
            # normalizes on device
            "images": rng.randint(0, 256, (1, H, W, 3)).astype(np.uint8),
            "labels": rng.randint(0, C, (1, H, W)).astype(np.uint8),
            "target": tgt[None],
            "spx": spx[None],
            "spmask": spmask[None],
            "fnames": [["img", f"lbl_{i}.png", f"spx_{i}"]],
        })
    suppix = {f"spx_{i}": np.nonzero(
        np.isin(np.arange(NSEG), np.unique(b["spx"])))[0].tolist()[:600]
        for i, b in enumerate(batches)}

    # warm (compile all shapes: one full fused_batch group, plus the
    # B=1 tail executable a 2975-image round would also hit)
    print("# compiling...", file=sys.stderr, flush=True)
    gen.generate(state.params, state.batch_stats,
                 batches[:gen.fused_batch], suppix=suppix)
    gen.generate(state.params, state.batch_stats, [batches[0]],
                 suppix=suppix)
    print("# warm, timing...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    gen.generate(state.params, state.batch_stats, batches, suppix=suppix)
    dt = time.perf_counter() - t0
    img_per_s = n_images / dt
    print(json.dumps({"metric": "cosprop_plbl_throughput",
                      "value": round(img_per_s, 3),
                      "unit": "images/sec/chip (1024x2048)"}))
    return img_per_s


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("score", "all"):
        bench_score()
    if which in ("plbl", "all"):
        bench_plbl()
