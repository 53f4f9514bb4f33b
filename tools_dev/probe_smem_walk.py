"""Probe: validate on the real TPU the Mosaic patterns the fixed sort-free
scatter kernel needs (ops/segment_pallas.py):

  1. an int32 input block in SMEM (pl.BlockSpec(memory_space=pltpu.SMEM))
     with dynamic scalar loads `ref[0, l]` inside a while_loop,
  2. dynamic-sublane (1, 128) read-modify-write on VMEM refs
     (`acc[pl.ds(s, 1), :]` with s data-dependent),
  3. a while_loop whose step is a data-dependent SMEM load.

Run: python tools_dev/probe_smem_walk.py  (prints OK + max error)
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 512
LANES = 128


def _kernel(sid_s, jump_s, val_ref, acc_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[...] = jnp.full(acc_ref.shape, -1.0, acc_ref.dtype)

    def cond(l):
        return l < CHUNK

    def body(l):
        s = sid_s[0, 0, l]

        @pl.when(s >= 0)
        def _():
            row = val_ref[pl.ds(l, 1), :]
            old = acc_ref[pl.ds(s, 1), :]
            acc_ref[pl.ds(s, 1), :] = jnp.where(row > old, row, old)

        return l + jump_s[0, 0, l]

    lax.while_loop(cond, body, 0)


@functools.partial(jax.jit, static_argnames=("num_segments",))
def smem_walk(sid, jump, vals, num_segments):
    G = sid.shape[0]
    S_pad = -(-num_segments // 8) * 8
    return pl.pallas_call(
        _kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 1, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((CHUNK, LANES), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((S_pad, LANES), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((S_pad, LANES), jnp.float32),
    )(sid[:, None, :], jump[:, None, :], vals)


def main():
    rng = np.random.default_rng(0)
    G, S = 4, 37
    # random run-structured sids: runs of length 1..9
    sid = np.zeros((G, CHUNK), np.int32)
    jump = np.zeros((G, CHUNK), np.int32)
    for g in range(G):
        l = 0
        while l < CHUNK:
            r = int(rng.integers(1, 10))
            r = min(r, CHUNK - l)
            s = int(rng.integers(-1, S))  # -1 = invalid
            sid[g, l:l + r] = s
            jump[g, l:l + r] = r  # jump from any lane inside = to run end
            for k in range(r):
                jump[g, l + k] = r - k
            l += r
    vals = rng.random((G * CHUNK, LANES), np.float32)

    out = smem_walk(jnp.asarray(sid), jnp.asarray(jump),
                    jnp.asarray(vals.reshape(G, CHUNK, LANES)
                                .reshape(G * CHUNK, LANES)),
                    num_segments=S)
    out = np.asarray(out)[:S]

    # reference: walk visits run leaders only; row taken is the LEADER row
    ref = np.full((S, LANES), -1.0, np.float32)
    for g in range(G):
        l = 0
        while l < CHUNK:
            s = sid[g, l]
            if s >= 0:
                row = vals[g * CHUNK + l]
                ref[s] = np.maximum(ref[s], row)
            l += jump[g, l]
    err = np.abs(out - ref).max()
    print("OK" if err == 0 else "MISMATCH", "max_err", err,
          "backend", jax.devices()[0].platform)


if __name__ == "__main__":
    main()
