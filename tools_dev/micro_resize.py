"""Microbench: jax.image.resize (bilinear, antialias=False) vs a 2-tap
take+lerp separable upsample vs a dense-matrix einsum, at the plbl
feat-upsample shape (1, 256, 512, 256) f32 -> (1, 1024, 2048, 256).

Run: python tools_dev/micro_resize.py
"""

import os
import sys
import time
import functools

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
import numpy as np


def _taps(out_n: int, in_n: int):
    """Half-pixel-center bilinear taps: for each output index, the two
    source indices (clamped) and the second tap's weight."""
    src = (np.arange(out_n) + 0.5) * (in_n / out_n) - 0.5
    i0 = np.floor(src).astype(np.int64)
    a = (src - i0).astype(np.float32)
    lo = np.clip(i0, 0, in_n - 1)
    hi = np.clip(i0 + 1, 0, in_n - 1)
    return lo, hi, a


def resize_lerp(x, size):
    B, H, W, C = x.shape
    oh, ow = size
    lo, hi, a = _taps(oh, H)
    av = jnp.asarray(a)[:, None, None]
    x = x[:, lo] * (1 - av) + x[:, hi] * av
    lo, hi, a = _taps(ow, W)
    av = jnp.asarray(a)[:, None]
    x = x[:, :, lo] * (1 - av) + x[:, :, hi] * av
    return x


def weight_mat(out_n, in_n):
    lo, hi, a = _taps(out_n, in_n)
    m = np.zeros((out_n, in_n), np.float32)
    m[np.arange(out_n), lo] += 1 - a
    m[np.arange(out_n), hi] += a
    return jnp.asarray(m)


def resize_mm(x, size):
    B, H, W, C = x.shape
    mh = weight_mat(size[0], H)
    mw = weight_mat(size[1], W)
    x = jnp.einsum("oh,bhwc->bowc", mh, x,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("ow,bhwc->bhoc", mw, x,
                      precision=jax.lax.Precision.HIGHEST)


def bench(f, x, size, name, n=10):
    g = jax.jit(functools.partial(f, size=size))
    y = g(x)
    _ = float(jnp.sum(y[..., 0]))
    t0 = time.perf_counter()
    for _i in range(n):
        y = g(x)
    _ = float(jnp.sum(y[..., 0]))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:14s} {dt*1000:8.1f} ms")
    return y


def main():
    from mulactseg_tpu.models.layers import resize_bilinear

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 256, 512, 256).astype(np.float32))
    size = (1024, 2048)

    ref = bench(lambda x, size: jax.image.resize(
        x, (1, size[0], size[1], 256), method="bilinear", antialias=False),
        x, size, "jax.image")
    lerp = bench(resize_lerp, x, size, "take+lerp")
    mm = bench(resize_mm, x, size, "matmul")
    ph = bench(resize_bilinear, x, size, "phase-lerp")

    for name, y in (("lerp", lerp), ("mm", mm), ("phase", ph)):
        d = float(jnp.max(jnp.abs(y - ref)))
        r = float(jnp.max(jnp.abs(y - ref) / (jnp.abs(ref) + 1e-6)))
        print(f"max abs dev {name}: {d:.3e}  rel {r:.3e}")


if __name__ == "__main__":
    main()
