"""Microbench gather/scatter variants on the TPU (dev tool).

Times by scalar fetch (axon block_until_ready is broken); each variant is
wrapped in a K-iteration lax.scan with varying data to amortize the ~75ms
dispatch latency.
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

P = 589824
S = 2048
C = 20
E = S * C
K = 8


def timed(name, fn, *args):
    out = fn(*args)
    _ = float(jnp.sum(out[-1] if isinstance(out, tuple) else out).astype(
        jnp.float32))
    t0 = time.perf_counter()
    reps = 3
    for _i in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(out[-1] if isinstance(out, tuple) else out).astype(
        jnp.float32))
    dt = (time.perf_counter() - t0) / reps / K * 1e3
    print(f"{name:44s} {dt:8.3f} ms/iter")
    return dt


def scanned(body):
    @jax.jit
    def run(x, idx):
        def step(c, k):
            return c, body(x, (idx + k) % x.shape[0])
        _, ys = jax.lax.scan(step, 0, jnp.arange(K, dtype=jnp.int32))
        return ys[-1]
    return run


def main():
    rng = np.random.RandomState(0)
    order = np.argsort(rng.randint(0, S, P), kind="stable").astype(np.int32)
    idx = jnp.asarray(order)

    for lanes in (128, 32, 24):
        v = jnp.asarray(rng.randn(P, lanes), jnp.float32)
        timed(f"row gather (P,{lanes}) f32",
              scanned(lambda x, i: jnp.take(x, i, axis=0)), v, idx)
    v16 = jnp.asarray(rng.randn(P, 128), jnp.bfloat16)
    timed("row gather (P,128) bf16",
          scanned(lambda x, i: jnp.take(x, i, axis=0)), v16, idx)

    # scatter variants: E entries into (P+1, C)
    pix = jnp.asarray(rng.randint(0, P, E), jnp.int32)
    cls = jnp.asarray(np.tile(np.arange(C), S), jnp.int32)
    rows = jnp.asarray(rng.randn(E, C), jnp.float32)
    coef = jnp.asarray(rng.randn(E), jnp.float32)

    def row_scatter(x, i):
        return jnp.zeros((P + 1, C), jnp.float32).at[i].add(rows)

    def elem_scatter(x, i):
        return jnp.zeros((P + 1, C), jnp.float32).at[i, cls].add(
            coef, unique_indices=True)

    def scalar_scatter(x, i):
        return jnp.zeros((P + 1,), jnp.float32).at[i].add(coef)

    def searchsorted_sum(x, i):
        q = i * C + cls
        sq, sc = jax.lax.sort((q, coef), num_keys=1)
        ends = jnp.searchsorted(sq, jnp.arange(1, (P + 1) * C + 1,
                                               dtype=jnp.int32))
        cs = jnp.concatenate([jnp.zeros(1, jnp.float32), jnp.cumsum(sc)])
        return (cs[ends] - cs[jnp.concatenate(
            [jnp.zeros(1, jnp.int32), ends[:-1]])]).reshape(P + 1, C)

    timed("row scatter-add E rows", scanned(row_scatter), pix, pix)
    timed("elem scatter-add E unique", scanned(elem_scatter), pix, pix)
    timed("scalar scatter-add E", scanned(scalar_scatter), pix, pix)
    timed("searchsorted segment-sum E->(P+1,C)",
          scanned(searchsorted_sum), pix, pix)


if __name__ == "__main__":
    main()
