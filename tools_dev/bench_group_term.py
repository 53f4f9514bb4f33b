"""TPU microbench: the group-term forward+backward at stage-1 shapes,
legacy sorted pipeline (--legacy, the library default) vs the sort-free
scatter-max kernel (MULACTSEG_NCHW_SCATTER=1, opt-in).

Times K chained evaluations inside one jit (data dependence via folding
the iteration index into the logits) and fetches a scalar, because the
axon tunnel's block_until_ready does not block.

Usage: python tools_dev/bench_group_term.py [--legacy] [--dbl N] [--k K]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

B, C, H, W, NSEG = 4, 20, 768, 768, 2048
HW = H * W
TEMP = 0.1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--legacy", action="store_true")
    ap.add_argument("--dbl", type=int, default=None)
    ap.add_argument("--k", type=int, default=8)
    a = ap.parse_args()
    os.environ["MULACTSEG_NCHW_SCATTER"] = "0" if a.legacy else "1"
    if a.dbl is not None:
        os.environ["MULACTSEG_NCHW_SCATTER_DBL"] = str(a.dbl)

    from mulactseg_tpu.data.synthetic import irregular_superpixels
    from mulactseg_tpu.ops.segment import segment_softmax_max_nchw

    rng = np.random.RandomState(0)
    lg = rng.randn(B, C, HW).astype(np.float32)
    spx = np.stack([irregular_superpixels(H, W, NSEG, rng)
                    for _ in range(B)]).reshape(B, HW)
    live = rng.rand(B, NSEG) < 0.35  # ~ multi-hot spx fraction
    mh = np.take_along_axis(live, spx, axis=1)
    sid = np.where(mh, spx + (np.arange(B)[:, None] * NSEG),
                   B * NSEG).reshape(-1).astype(np.int32)

    lg_j = jnp.asarray(lg, jnp.bfloat16).astype(jnp.float32)
    sid_j = jnp.asarray(sid)
    K = a.k

    def one(x):
        mx, _ = segment_softmax_max_nchw(x, sid_j, B * NSEG, TEMP)
        return jnp.sum(-jnp.log(mx + 1e-8) * (mx > 0))

    @jax.jit
    def chained(x0):
        def body(c, i):
            l, g = jax.value_and_grad(one)(x0 + c * 1e-6 +
                                           i.astype(jnp.float32) * 0.0)
            return g, l
        g, ls = jax.lax.scan(body, jnp.zeros_like(x0),
                             jnp.arange(K, dtype=jnp.int32))
        return jnp.sum(ls) + jnp.sum(g)

    t0 = time.perf_counter()
    out = chained(lg_j)
    _ = float(out)
    print(f"compile+first: {time.perf_counter() - t0:.1f} s")
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = chained(lg_j)
    _ = float(out)
    dt = (time.perf_counter() - t0) / (reps * K)
    path = "legacy" if a.legacy else f"scatter dbl={a.dbl or 6}"
    print(f"{path}: {dt * 1e3:.2f} ms per fwd+bwd eval")


if __name__ == "__main__":
    main()
