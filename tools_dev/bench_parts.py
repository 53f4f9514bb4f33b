"""Split the stage-1 step cost into model vs loss parts on the TPU.

Runs make_train_step_scan-style K-step scans with different criteria:
  ce        mean-CE surrogate (pure conv-stack fwd+bwd+AdamW)
  pixonly   fused CE/MC pallas terms only (no group)
  grouponly group (segment softmax max) term only
  full      the shipped lossdecomp_fused
Usage: python tools_dev/bench_parts.py [ce pixonly grouponly full]
"""

import os
import sys
import time

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
K = 8


def main(modes):
    from mulactseg_tpu.config import Config
    from mulactseg_tpu.engine.state import create_train_state
    from mulactseg_tpu.models import get_model
    from mulactseg_tpu.losses.fused import (lossdecomp_fused,
                                            pixel_target_bits)
    from mulactseg_tpu.ops.pixel_loss_pallas import pixel_partial_ce
    from mulactseg_tpu.ops.segment import segment_softmax_max

    cfg = Config(num_classes=C, nseg=NSEG, crop_size=(H, W),
                 train_batch_size=BATCH,
                 method="active_joint_multi_predignore_lossdecomp",
                 dtype="bfloat16")
    model = get_model(cfg.model, num_classes=cfg.num_model_classes,
                      output_stride=cfg.output_stride, dtype=jnp.bfloat16)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               (BATCH, H, W, 3))

    rng = np.random.RandomState(0)
    target = (rng.rand(K, BATCH, NSEG, C + 1) < 0.15).astype(np.float32)
    from mulactseg_tpu.data.synthetic import irregular_superpixels
    spx = np.stack([np.stack([irregular_superpixels(H, W, NSEG, rng)
                    for _ in range(BATCH)]) for _ in range(K)]).astype(np.int32)
    sel = rng.rand(K, BATCH, NSEG) < 0.5
    spmask = np.take_along_axis(sel, spx.reshape(K, BATCH, -1),
                                axis=2).reshape(K, BATCH, H, W)
    bits = np.stack([
        np.stack([pixel_target_bits(target[k, b], spx[k, b], spmask[k, b])
                  for b in range(BATCH)]) for k in range(K)])
    sb = {
        "images": jnp.asarray(rng.randn(K, BATCH, H, W, 3), jnp.bfloat16),
        "target": jnp.asarray(target),
        "target_bits": jnp.asarray(bits),
        "spx": jnp.asarray(spx),
        "labels": jnp.asarray(rng.randint(0, C, (K, BATCH, H, W)), jnp.int32),
    }

    def crit(mode, logits, batch):
        N = BATCH * H * W
        Cm = logits.shape[-1]
        if mode == "ce":
            ll = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            return -jnp.mean(jnp.take_along_axis(
                ll, batch["labels"][..., None], -1))
        lg = logits.astype(jnp.float32).reshape(N, Cm)
        b = batch["target_bits"].reshape(N).astype(jnp.int32)
        if mode == "pixonly":
            oh_sum, oh_cnt, mh_sum, mh_cnt = pixel_partial_ce(lg, b, 0.1)
            return 16.0 * oh_sum / (1 + oh_cnt) + 8.0 * mh_sum / (1 + mh_cnt)
        if mode == "grouponly":
            shifts = jnp.arange(Cm, dtype=jnp.int32)
            n_cand = jnp.sum((b[:, None] >> shifts) & 1, axis=-1)
            off = jnp.repeat(jnp.arange(BATCH, dtype=jnp.int32) * NSEG, H * W)
            sid = jnp.where(n_cand > 1, batch["spx"].reshape(N) + off,
                            BATCH * NSEG)
            mx, pix = segment_softmax_max(lg / 0.1, sid, BATCH * NSEG)
            mx = mx.reshape(BATCH, NSEG, Cm)
            present = (pix[:, 0] < N).reshape(BATCH, NSEG)
            entry = (batch["target"] > 0.5) & present[:, :, None]
            return jnp.sum(jnp.where(entry, -jnp.log(mx + 1e-8), 0.0)) / (
                1.0 + jnp.sum(entry))
        total, _ = lossdecomp_fused(
            logits, batch["target_bits"], batch["target"], batch["spx"],
            nseg=NSEG, multi_ce_temp=0.1, group_ce_temp=0.1)
        return total

    for mode in modes:
        def loss_fn(params, batch_stats, batch, rng_):
            out, mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["images"], train=True, mutable=["batch_stats"],
                rngs={"dropout": rng_})
            return crit(mode, out, batch), mut["batch_stats"]

        def one(s, xs):
            batch, r = xs
            (l, bs), g = jax.value_and_grad(loss_fn, has_aux=True)(
                s.params, s.batch_stats, batch, r)
            return s.apply_gradients(g, bs), l

        @jax.jit
        def run(s, b, r):
            rs = jax.random.split(r, K)
            return jax.lax.scan(one, s, (b, rs))

        st = jax.device_put(state)
        key = jax.random.PRNGKey(0)
        st, ls = run(st, sb, key)
        _ = float(ls[-1])
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            key, k2 = jax.random.split(key)
            st, ls = run(st, sb, k2)
        _ = float(ls[-1])
        dt = (time.perf_counter() - t0) / (n * K)
        print(f"{mode:10s} {dt*1e3:7.1f} ms/step  "
              f"{BATCH/dt:6.1f} img/s")


if __name__ == "__main__":
    main(sys.argv[1:] or ["ce", "pixonly", "grouponly", "full"])
