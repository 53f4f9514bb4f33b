"""Microbench: train-mode BatchNorm fwd+bwd variants on TPU at stage-1-like
shapes (dev tool). The round-2 profile shows ~17 ms/step attributed to
FastBatchNorm's stats path (loop fusion + data formatting at
models/layers.py:70); this isolates the stats-pass cost and compares:

  current   f32-cast then one-pass E[x2]-E[x]^2 (FastBatchNorm today)
  convred   converting reduces (jnp.sum dtype=f32, no materialized cast)
  bf16sq    squares computed in bf16, f32 accumulation
  flaxbn    flax nn.BatchNorm(use_fast_variance=True)

Run: python tools_dev/bench_bn.py
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

# representative stage-1 BN shapes (B, H, W, C) x count in the resnet50
SHAPES = [
    ((4, 192, 192, 256), 10),   # layer1-ish
    ((4, 96, 96, 512), 12),     # layer2
    ((4, 48, 48, 1024), 18),    # layer3
    ((4, 48, 48, 2048), 10),    # layer4 (dilated, os16)
]
REPS = 30


def stats_current(x):
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    m = jnp.mean(xf, axis=axes)
    m2 = jnp.mean(jnp.square(xf), axis=axes)
    return m, jnp.maximum(m2 - jnp.square(m), 0.0)


def stats_convred(x):
    axes = tuple(range(x.ndim - 1))
    n = float(np.prod([x.shape[a] for a in axes]))
    m = jnp.sum(x, axis=axes, dtype=jnp.float32) / n
    m2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axes) / n
    return m, jnp.maximum(m2 - jnp.square(m), 0.0)


def stats_bf16sq(x):
    axes = tuple(range(x.ndim - 1))
    n = float(np.prod([x.shape[a] for a in axes]))
    m = jnp.sum(x, axis=axes, dtype=jnp.float32) / n
    m2 = jnp.sum(jnp.square(x), axis=axes, dtype=jnp.float32) / n
    return m, jnp.maximum(m2 - jnp.square(m), 0.0)


def stats_einsum(x):
    # FastBatchNorm today (models/layers.py:83-87): converting-reduce mean
    # + self-contraction for E[x^2] (bf16 products exact in the f32
    # accumulator)
    axes = tuple(range(x.ndim - 1))
    n = float(np.prod([x.shape[a] for a in axes]))
    m = jnp.sum(x, axis=axes, dtype=jnp.float32) / n
    xf = x.reshape(-1, x.shape[-1])
    m2 = jnp.einsum("pc,pc->c", xf, xf,
                    preferred_element_type=jnp.float32) / n
    return m, jnp.maximum(m2 - jnp.square(m), 0.0)


def bn_apply(stats_fn, x, scale, bias):
    m, v = stats_fn(x)
    a = scale * jax.lax.rsqrt(v + 1e-5)
    b = bias - m * a
    dt = x.dtype
    return x * a.astype(dt) + b.astype(dt)


def make_loss(stats_fn, shapes):
    def loss(params, xs):
        t = 0.0
        for i, x in enumerate(xs):
            y = bn_apply(stats_fn, x, params[2 * i], params[2 * i + 1])
            t = t + jnp.sum(y.astype(jnp.float32) * y.astype(jnp.float32))
        return t
    return loss


def bench(name, stats_fn, xs, params):
    loss = make_loss(stats_fn, [x.shape for x in xs])
    g = jax.jit(jax.value_and_grad(loss, argnums=1))
    v, _ = g(params, xs)
    _ = float(v)  # compile + sync
    t0 = time.perf_counter()
    for _ in range(REPS):
        v, gx = g(params, xs)
    _ = float(v)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:10s} {dt:7.2f} ms per fwd+bwd pass")
    return dt


def main():
    rng = np.random.RandomState(0)
    xs, params = [], []
    for (shape, count) in SHAPES:
        # one representative tensor per stage; weight by count via repeats
        for _ in range(max(1, count // 6)):
            xs.append(jnp.asarray(rng.randn(*shape), jnp.bfloat16))
    for x in xs:
        params.append(jnp.ones((x.shape[-1],), jnp.float32))
        params.append(jnp.zeros((x.shape[-1],), jnp.float32))
    total_mb = sum(np.prod(x.shape) * 2 for x in xs) / 1e6
    print(f"{len(xs)} tensors, {total_mb:.0f} MB bf16 total")
    for name, fn in [("current", stats_current), ("convred", stats_convred),
                     ("bf16sq", stats_bf16sq), ("einsum", stats_einsum)]:
        bench(name, fn, xs, params)


if __name__ == "__main__":
    main()
