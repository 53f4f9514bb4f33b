"""Pallas TPU kernel for segment max/argmax over sorted runs.

The XLA associative-scan path (ops/segment.py) touches the (P, C) value
array ~log2(P) times; at the stage-1 training shape (589k pixels x 20
classes x batch 4) that is gigabytes of HBM traffic per step, and
autodiff through the scan triples it. This kernel reads the sorted
values exactly once: one grid program per segment DMAs its run
[starts[s], ends[s]) from HBM in fixed-size chunks and keeps a running
(max, first-argmax) in VMEM. Per-segment ranges come from the same
searchsorted metadata the scan path uses.

The public wrapper `segment_max_pallas` takes values in sorted order,
padded to 128 lanes, and returns (max (S,128), argpos (S,128)) where
argpos is the position in *sorted* order (callers map back through the
sort permutation); absent segments report fill / P, matching
torch_scatter semantics (see ops/segment.py docstring).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# rows per DMA; runs longer than this loop over chunks. With the NCHW
# prereduce (R=4) the average run is ~72 rows, so a big chunk over-fetches
# bandwidth. Env knob for tuning per hardware (DMA latency : bandwidth).
CHUNK = int(os.environ.get("MULACTSEG_RUNWALK_CHUNK", "512"))


SEGS_PER_BLOCK = 8  # TPU output tiles must be (8, 128)


def _max_kernel_db(starts_ref, ends_ref, g_hbm, out_val, out_idx, chunk,
                   sem, *, fill: float, P: int):
    """_kernel with the DMAs double-buffered ACROSS segments (the same
    pipeline as _softmax_kernel, minus the in-register softmax). The
    single-buffered start->wait->compute loop serializes ~0.75 us of DMA
    latency per segment — ~6 ms/step at stage-1 shapes (8k segments) —
    which the cross-segment prefetch hides behind the reduction."""
    blk = pl.program_id(0)

    def seg_start(s):
        # first aligned row of segment s's run (sublane multiple of 8)
        return (starts_ref[s] // 8) * 8

    def n_chunks(s):
        # >= 1 so the pipeline stays regular; empty segments are masked out
        return jnp.maximum(
            lax.div(ends_ref[s] - seg_start(s) + (CHUNK - 1), CHUNK), 1)

    def start_dma(s, i, slot):
        pltpu.make_async_copy(
            g_hbm.at[pl.ds(seg_start(s) + i * CHUNK, CHUNK)],
            chunk.at[slot], sem.at[slot]).start()

    s0 = blk * SEGS_PER_BLOCK
    start_dma(s0, 0, 0)

    def seg_body(j, q):
        s = s0 + j
        st = starts_ref[s]
        en = ends_ref[s]
        st0 = seg_start(s)
        nch = n_chunks(s)

        def body(i, carry):
            vmax, imax, q = carry
            # queue the successor chunk before consuming the current one
            has_next_i = i + 1 < nch

            @pl.when(has_next_i)
            def _():
                start_dma(s, i + 1, (q + 1) % 2)

            @pl.when(jnp.logical_not(has_next_i) & (j + 1 < SEGS_PER_BLOCK))
            def _():
                start_dma(s + 1, 0, (q + 1) % 2)

            slot = q % 2
            pltpu.make_async_copy(
                g_hbm.at[pl.ds(st0 + i * CHUNK, CHUNK)],
                chunk.at[slot], sem.at[slot]).wait()
            base = st0 + i * CHUNK
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (CHUNK, LANES), 0) + base
            valid = (rows >= st) & (rows < en)
            v = jnp.where(valid, chunk[slot].astype(jnp.float32), -jnp.inf)
            cmax = jnp.max(v, axis=0, keepdims=True)
            hit = v == cmax
            cidx = jnp.min(jnp.where(hit & valid, rows, P), axis=0,
                           keepdims=True)
            take = cmax > vmax
            vmax = jnp.where(take, cmax, vmax)
            imax = jnp.where(take, cidx, imax)
            return vmax, imax, q + 1

        init = (jnp.full((1, LANES), -jnp.inf, jnp.float32),
                jnp.full((1, LANES), P, jnp.int32), q)
        vmax, imax, q = lax.fori_loop(0, nch, body, init)
        has = en > st
        out_val[pl.ds(j, 1), :] = jnp.where(has, vmax, jnp.float32(fill))
        out_idx[pl.ds(j, 1), :] = jnp.where(has, imax, jnp.int32(P))
        return q

    lax.fori_loop(0, SEGS_PER_BLOCK, seg_body, 0)


def _softmax_kernel(starts_ref, ends_ref, g_hbm, out_val, out_idx, chunk,
                    sem, *, fill: float, P: int, C: int):
    """Like _kernel but (a) the DMA'd rows are (logit/temp) values — each
    row is softmaxed in-register (lanes >= C masked) before the segmented
    max, so the (P, C) probability array never exists in HBM — and (b)
    DMAs are double-buffered ACROSS segments: while segment j's chunk is
    being reduced, the next chunk (j's next, or segment j+1's first) is
    already in flight. The serial start->wait->compute loop of _kernel
    costs ~1.5 us of dead DMA latency per segment (~12 ms/step at stage-1
    shapes); pipelining hides it behind the reduction."""
    blk = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, LANES), 1)
    lane_ok = lane < C

    def seg_start(s):
        # first aligned row of segment s's run (sublane multiple of 8)
        return (starts_ref[s] // 8) * 8

    def n_chunks(s):
        # >= 1 so the pipeline stays regular; empty segments are masked out
        return jnp.maximum(
            lax.div(ends_ref[s] - seg_start(s) + (CHUNK - 1), CHUNK), 1)

    def start_dma(s, i, slot):
        dma = pltpu.make_async_copy(
            g_hbm.at[pl.ds(seg_start(s) + i * CHUNK, CHUNK)],
            chunk.at[slot], sem.at[slot])
        dma.start()

    s0 = blk * SEGS_PER_BLOCK
    start_dma(s0, 0, 0)

    def seg_body(j, q):
        s = s0 + j
        st = starts_ref[s]
        en = ends_ref[s]
        st0 = seg_start(s)
        nch = n_chunks(s)

        def body(i, carry):
            vmax, imax, q = carry
            # queue the successor chunk before consuming the current one
            has_next_i = i + 1 < nch

            @pl.when(has_next_i)
            def _():
                start_dma(s, i + 1, (q + 1) % 2)

            @pl.when(jnp.logical_not(has_next_i) & (j + 1 < SEGS_PER_BLOCK))
            def _():
                start_dma(s + 1, 0, (q + 1) % 2)

            slot = q % 2
            pltpu.make_async_copy(
                g_hbm.at[pl.ds(st0 + i * CHUNK, CHUNK)],
                chunk.at[slot], sem.at[slot]).wait()
            base = st0 + i * CHUNK
            u = jnp.where(lane_ok, chunk[slot].astype(jnp.float32),
                          -jnp.inf)
            m = jnp.max(u, axis=1, keepdims=True)
            e = jnp.where(lane_ok, jnp.exp(u - m), 0.0)
            p = e / jnp.sum(e, axis=1, keepdims=True)
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (CHUNK, LANES), 0) + base
            valid = (rows >= st) & (rows < en)
            v = jnp.where(valid, p, -jnp.inf)
            cmax = jnp.max(v, axis=0, keepdims=True)
            hit = v == cmax
            cidx = jnp.min(jnp.where(hit & valid, rows, P), axis=0,
                           keepdims=True)
            take = cmax > vmax
            vmax = jnp.where(take, cmax, vmax)
            imax = jnp.where(take, cidx, imax)
            return vmax, imax, q + 1

        init = (jnp.full((1, LANES), -jnp.inf, jnp.float32),
                jnp.full((1, LANES), P, jnp.int32), q)
        vmax, imax, q = lax.fori_loop(0, nch, body, init)
        has = en > st
        out_val[pl.ds(j, 1), :] = jnp.where(has, vmax, jnp.float32(fill))
        out_idx[pl.ds(j, 1), :] = jnp.where(has, imax, jnp.int32(P))
        return q

    lax.fori_loop(0, SEGS_PER_BLOCK, seg_body, 0)


def _run_segment_kernel(kernel, g: jax.Array, starts: jax.Array,
                        ends: jax.Array, interpret: bool):
    """Shared pallas_call plumbing for the run-walking segment kernels.
    `g` must already be (P, LANES) f32 in segment-sorted order. Scratch is
    a 2-slot chunk buffer + DMA semaphore pair for double buffering."""
    P = g.shape[0]
    S = starts.shape[0]
    # 2*CHUNK pad: the double-buffered prefetch can run one full chunk
    # past the last segment's end
    g = jnp.pad(g, ((0, 2 * CHUNK + 8), (0, 0)), constant_values=0.0)
    S_pad = (-S) % SEGS_PER_BLOCK
    if S_pad:
        starts = jnp.pad(starts, (0, S_pad))
        ends = jnp.pad(ends, (0, S_pad))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=((S + S_pad) // SEGS_PER_BLOCK,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((SEGS_PER_BLOCK, LANES), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SEGS_PER_BLOCK, LANES), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, LANES), g.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_val, out_idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((S + S_pad, LANES), jnp.float32),
            jax.ShapeDtypeStruct((S + S_pad, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(starts.astype(jnp.int32), ends.astype(jnp.int32), g)
    return out_val[:S], out_idx[:S]


@functools.partial(jax.jit, static_argnames=("num_classes", "interpret"))
def segment_softmax_max_pallas(g_sorted: jax.Array, starts: jax.Array,
                               ends: jax.Array, num_classes: int,
                               interpret: bool = False):
    """g_sorted: (P, 128) f32 temperature-scaled logits in segment-sorted
    order (pad lanes arbitrary). Per-pixel softmax over the first
    `num_classes` lanes happens inside the kernel; returns ((S, 128) max
    prob, (S, 128) argpos-in-sorted-order). Absent segments -> (0, P)."""
    P, C = g_sorted.shape
    assert C == LANES, "pre-pad logits to 128 lanes"
    kern = functools.partial(_softmax_kernel, fill=0.0, P=P,
                             C=num_classes)
    return _run_segment_kernel(kern, g_sorted, starts, ends, interpret)


@functools.partial(jax.jit, static_argnames=("fill", "interpret",
                                             "pre_padded"))
def segment_max_pallas(g_sorted: jax.Array, starts: jax.Array,
                       ends: jax.Array, fill: float = 0.0,
                       interpret: bool = False, pre_padded: bool = False):
    """g_sorted: (P, C<=128) f32/bf16 values in segment-sorted order.
    starts/ends: (S,) int32 run ranges. Returns ((S, C) max, (S, C)
    argpos-in-sorted-order). pre_padded: caller guarantees 128 lanes AND
    >= CHUNK+8 rows of slack past the last run (skips two full-array
    copies on the hot path)."""
    P, C = g_sorted.shape
    S = starts.shape[0]
    g = g_sorted
    if not pre_padded:
        if C < LANES:
            g = jnp.pad(g, ((0, 0), (0, LANES - C)), constant_values=0.0)
        # pad rows so chunked DMAs past the last run stay in bounds
        g = jnp.pad(g, ((0, CHUNK + 8), (0, 0)), constant_values=0.0)
    S_pad = (-S) % SEGS_PER_BLOCK
    if S_pad:
        starts = jnp.pad(starts, (0, S_pad))
        ends = jnp.pad(ends, (0, S_pad))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=((S + S_pad) // SEGS_PER_BLOCK,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((SEGS_PER_BLOCK, LANES), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SEGS_PER_BLOCK, LANES), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, LANES), g.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_val, out_idx = pl.pallas_call(
        functools.partial(_max_kernel_db, fill=fill, P=P),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((S + S_pad, LANES), jnp.float32),
            jax.ShapeDtypeStruct((S + S_pad, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(starts.astype(jnp.int32), ends.astype(jnp.int32), g)
    return out_val[:S, :C], out_idx[:S, :C]


# ---------------------------------------------------------------------------
# Raster-block pre-reduction kernel (see ops/segment._ssm_impl): softmax +
# same-sid block merge + lane pad in ONE pass. The equivalent XLA chain
# materializes probs / masked / selected arrays separately (~8 ms/step at
# stage-1 shapes); this kernel reads the scaled logits once and writes the
# padded bf16 gather source + the per-block argmax choice.
# ---------------------------------------------------------------------------

PRE_CHUNK = 2048


def _prereduce_kernel(lg_ref, sid_ref, out_v, out_choice, *, C, R,
                      num_segments):
    lg = lg_ref[...].astype(jnp.float32)          # (CH, C)
    s = sid_ref[...]                              # (CH, 1) int32
    CH = lg.shape[0]
    m = jnp.max(lg, axis=1, keepdims=True)
    e = jnp.exp(lg - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)     # per-pixel softmax
    pb = p.reshape(CH // R, R, C)
    sb = s.reshape(CH // R, R)
    eq = sb == sb[:, :1]                          # col 0 always True
    vm = jnp.where(eq[..., None], pb, -1.0)
    merged = jnp.max(vm, axis=1)                  # (CH/R, C)
    choice = jnp.argmax(vm, axis=1)               # first max
    col0 = (jax.lax.broadcasted_iota(jnp.int32, (1, R, 1), 1) == 0)
    v2 = jnp.where(col0, merged[:, None, :], pb).reshape(CH, C)
    out_v[:, :C] = v2.astype(out_v.dtype)
    out_v[:, C:] = jnp.zeros((CH, LANES - C), out_v.dtype)
    out_choice[...] = choice.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("R", "num_segments",
                                             "interpret"))
def prereduce_softmax_blocks(scaled_logits, sid, R: int, num_segments: int,
                             interpret: bool = False):
    """(P, C<=128) f32 scaled logits + (P,) sid -> ((P, 128) bf16 padded
    per-pixel softmax probs with row 4i holding the per-class max over the
    block rows sharing sid[4i], (P/R, C) int32 per-class winning offset).
    P must be a multiple of R*PRE_CHUNK-compatible padding (caller pads)."""
    P, C = scaled_logits.shape
    assert P % PRE_CHUNK == 0, P
    sid2d = sid.reshape(P, 1).astype(jnp.int32)
    grid = (P // PRE_CHUNK,)
    out_v, out_choice = pl.pallas_call(
        functools.partial(_prereduce_kernel, C=C, R=R,
                          num_segments=num_segments),
        grid=grid,
        in_specs=[
            pl.BlockSpec((PRE_CHUNK, C), lambda b: (b, 0)),
            pl.BlockSpec((PRE_CHUNK, 1), lambda b: (b, 0)),
        ],
        out_specs=[
            pl.BlockSpec((PRE_CHUNK, LANES), lambda b: (b, 0)),
            pl.BlockSpec((PRE_CHUNK // R, C), lambda b: (b, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P, LANES), jnp.bfloat16),
            jax.ShapeDtypeStruct((P // R, C), jnp.int32),
        ],
        interpret=interpret,
    )(scaled_logits, sid2d)
    return out_v, out_choice


# ---------------------------------------------------------------------------
# NCHW-input pre-reduction: softmax + raster-block merge + lane-pad in ONE
# pass over the logits' native layout.
#
# The row-major prereduce above must be fed a (P, C) f32 array, which from
# the model's NCHW logits costs a ~190 MB relayout plus 6.4x lane-padded
# (20 -> 128) kernel reads. This kernel reads (B, C, HW) directly (free
# bitcast of the logits XLA already stores NCHW), computes the softmax
# across sublanes, merges raster blocks of R consecutive pixels that share
# a segment id (lane rolls + masked max), and writes the row-major
# lane-padded bf16 rows the sorted gather wants — the transpose happens
# in VMEM, never in HBM.
# ---------------------------------------------------------------------------

NCHW_CHUNK = 2048  # pixels per grid cell; HW must divide


def _prereduce_nchw_kernel(lg_ref, sid_ref, outv_ref, choice_ref, *,
                           R, inv_temp):
    p_all = lg_ref[0].astype(jnp.float32) * inv_temp   # (C, CHUNK)
    m = jnp.max(p_all, axis=0, keepdims=True)
    e = jnp.exp(p_all - m)
    p = e / jnp.sum(e, axis=0, keepdims=True)          # per-pixel softmax
    sid = sid_ref[0]                                   # (1, CHUNK) int32
    CHUNK = p.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    pos = lane % R
    # leader (block-start) segment id per lane via lane rolls
    lead = sid
    for k in range(1, R):
        lead = jnp.where(pos == k, pltpu.roll(sid, k, 1), lead)
    eq = sid == lead
    pm = jnp.where(eq, p, -1.0)                        # (C, CHUNK)
    merged = pm
    rolls = [pm]
    for k in range(1, R):
        # left-rotate by k == right-rotate by CHUNK-k (pltpu.roll only
        # accepts non-negative shifts)
        rk = pltpu.roll(pm, CHUNK - k, 1)
        rolls.append(rk)
        merged = jnp.maximum(merged, rk)
    # first-max offset within the block (reference argmax tie-break)
    ch = jnp.full(merged.shape, R - 1, jnp.int32)
    for k in range(R - 2, -1, -1):
        ch = jnp.where(rolls[k] == merged, k, ch)
    out = jnp.where(pos == 0, merged, p)               # (C, CHUNK)
    out_t = out.T                                      # (CHUNK, C) in VMEM
    C = out_t.shape[1]
    outv_ref[:, :C] = out_t.astype(outv_ref.dtype)
    outv_ref[:, C:] = jnp.zeros((CHUNK, LANES - C), outv_ref.dtype)
    # compress leader lanes (every R-th) with a selector matmul: the MXU
    # eats the strided-lane pick Mosaic can't express cheaply
    rows = jax.lax.broadcasted_iota(jnp.int32, (CHUNK // R, CHUNK), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK // R, CHUNK), 1)
    sel = (cols == rows * R).astype(jnp.float32)       # (CHUNK/R, CHUNK)
    choice_ref[...] = jax.lax.dot_general(
        sel, ch.astype(jnp.float32).T,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Sort-free NCHW group term: softmax + run merge + scatter-max in ONE kernel.
#
# The sorted pipeline (prereduce -> HBM gather source -> key sort -> chunked
# gather -> run-walk kernel) costs ~19 ms/step at stage-1 shapes, most of it
# HBM latency: the (P, 128) bf16 gather source is a ~600 MB round trip and
# the sorted gather is latency-bound (~13.5 ns/row). This kernel never
# leaves VMEM: per 2048-pixel chunk it softmaxes the (C, CHUNK) logits
# block, merges raster runs of equal segment id with a lane-roll doubling
# scan (val, first-argmax, and reach per lane), transposes the merged
# columns to rows once, and then a scalar walk jumps run-to-run doing one
# (1, 128) read-modify-write per run into a VMEM-resident (S_pad, 128)
# accumulator pair that lives across all grid cells (constant out-block
# index map). Grid cells execute in raster order on the single TPU core,
# and updates use strict >, so ties keep the first pixel in raster order —
# exactly the sorted pipeline's first-argmax semantics.
# ---------------------------------------------------------------------------


def _scatter_max_nchw_kernel(lg_ref, sid_ref, sid_s, jump_s, accv, acci,
                             scr_v, scr_i, *, inv_temp, P, invalid, dbl):
    cell = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(cell == 0)
    def _():
        # -1 init, NOT 0: softmax probs can underflow to exactly 0.0
        # (e.g. temp 0.1 scales logits by 10; a >=~10.4 logit gap gives
        # exp == 0.0 in f32), and a 0.0 row must still BEAT the init so
        # present segments get a real argmax pixel. The caller maps
        # never-updated rows (acci == P) back to the 0.0 fill.
        accv[...] = jnp.full(accv.shape, -1.0, accv.dtype)
        acci[...] = jnp.full(acci.shape, P, acci.dtype)

    lg = lg_ref[0].astype(jnp.float32) * inv_temp      # (C, CHUNK)
    m = jnp.max(lg, axis=0, keepdims=True)
    e = jnp.exp(lg - m)
    p = e / jnp.sum(e, axis=0, keepdims=True)          # per-pixel softmax
    sid = sid_ref[0]                                   # (1, CHUNK) int32
    C, CH = p.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1)
    base = cell * CH                                   # global pixel base
    val = p
    idx = jnp.broadcast_to(lane + base, (C, CH))
    reach = jnp.ones((1, CH), jnp.int32)
    # doubling scan: after step k, reach[l] = min(run_len(l), 2^k) and
    # val/idx[l] = (max, first-argmax) over lanes [l, l + reach[l])
    d = 1
    for _ in range(dbl):
        back = CH - d                                  # left-rotate by d
        ext = ((reach == d) & (pltpu.roll(sid, back, 1) == sid)
               & (lane + d < CH))
        v_d = pltpu.roll(val, back, 1)
        take = ext & (v_d > val)
        val = jnp.where(take, v_d, val)
        idx = jnp.where(take, pltpu.roll(idx, back, 1), idx)
        reach = jnp.where(ext, reach + pltpu.roll(reach, back, 1), reach)
        d *= 2
    # one VMEM transpose so the walk reads (1, 128) rows; pad lanes get 0
    # (they beat the -1 init but their columns are sliced off at return)
    scr_v[:, :C] = val.T
    scr_v[:, C:] = jnp.zeros((CH, LANES - C), jnp.float32)
    scr_i[:, :C] = idx.T
    scr_i[:, C:] = jnp.zeros((CH, LANES - C), jnp.int32)
    del reach  # the walk's jump stream comes precomputed via SMEM

    def cond(l):
        return l < CH

    def body(l):
        # scalar loads MUST come from SMEM: a dynamic lane index into a
        # VMEM ref is rejected by Mosaic ("cannot statically prove that
        # index in dimension 2 is a multiple of 128") — measured on the
        # real v5e (BASELINE.md round-4 knob table). The sid/jump streams
        # are therefore fed a second time as SMEM blocks.
        s = sid_s[0, 0, l]

        @pl.when(s != invalid)
        def _():
            row = scr_v[pl.ds(l, 1), :]
            old = accv[pl.ds(s, 1), :]
            take = row > old
            accv[pl.ds(s, 1), :] = jnp.where(take, row, old)
            oldi = acci[pl.ds(s, 1), :]
            acci[pl.ds(s, 1), :] = jnp.where(take, scr_i[pl.ds(l, 1), :],
                                             oldi)

        return l + jump_s[0, 0, l]

    lax.while_loop(cond, body, 0)


@functools.partial(jax.jit, static_argnames=("temp", "num_segments",
                                             "interpret", "dbl"))
def scatter_softmax_max_nchw(logits_cs, sid3, temp: float,
                             num_segments: int, interpret: bool = False,
                             dbl: int = 6):
    """(B, C<=128, HW) logits (native NCHW view, HW % NCHW_CHUNK == 0) +
    (B, 1, HW) int32 GLOBAL segment ids (invalid marker == num_segments)
    -> ((S, C) f32 max softmax(logits/temp) prob, (S, C) int32 first-argmax
    global pixel index, P for absent segments). Sort-free equivalent of
    segment_softmax_max_nchw's forward (see module comment above).

    dbl: doubling-scan depth; runs longer than 2^dbl lanes split into
    multiple accumulator updates (still exact — the scatter merges them).
    """
    B, C, HW = logits_cs.shape
    assert HW % NCHW_CHUNK == 0, HW
    assert C <= LANES, C
    G = HW // NCHW_CHUNK
    P = B * HW
    S_pad = -(-(num_segments + 1) // 8) * 8
    sid3 = sid3.astype(jnp.int32)
    # the walk's jump table, precomputed in XLA (it depends only on sid):
    # jump[l] = min(lanes until the sid changes or the chunk ends, 2**dbl)
    # == the kernel's doubling-scan reach, so l += jump visits exactly the
    # positions whose (val, idx) cover the chunk disjointly
    sc = sid3.reshape(B * G, NCHW_CHUNK)
    pos = jnp.arange(NCHW_CHUNK, dtype=jnp.int32)[None, :]
    change = jnp.concatenate(
        [sc[:, 1:] != sc[:, :-1],
         jnp.ones((B * G, 1), bool)], axis=1)
    boundary = jnp.where(change, pos + 1, NCHW_CHUNK)
    nxt = lax.cummin(boundary, axis=1, reverse=True)
    jump = jnp.minimum(nxt - pos, 1 << dbl)
    smem_spec = pl.BlockSpec((1, 1, NCHW_CHUNK),
                             lambda b, i: (b * (HW // NCHW_CHUNK) + i, 0, 0),
                             memory_space=pltpu.SMEM)
    accv, acci = pl.pallas_call(
        functools.partial(_scatter_max_nchw_kernel, inv_temp=1.0 / temp,
                          P=P, invalid=num_segments, dbl=dbl),
        grid=(B, G),
        in_specs=[
            pl.BlockSpec((1, C, NCHW_CHUNK), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, 1, NCHW_CHUNK), lambda b, i: (b, 0, i)),
            smem_spec,
            smem_spec,
        ],
        out_specs=[
            pl.BlockSpec((S_pad, LANES), lambda b, i: (0, 0)),
            pl.BlockSpec((S_pad, LANES), lambda b, i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S_pad, LANES), jnp.float32),
            jax.ShapeDtypeStruct((S_pad, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((NCHW_CHUNK, LANES), jnp.float32),
            pltpu.VMEM((NCHW_CHUNK, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(logits_cs, sid3, sc[:, None, :], jump[:, None, :])
    mx, pix = accv[:num_segments, :C], acci[:num_segments, :C]
    # the accumulator inits at -1 so that an exactly-0.0 max prob (f32
    # softmax underflow) still wins and records its argmax pixel; absent
    # (never-updated) entries map back to the sorted/dense paths' 0.0 fill
    return jnp.where(pix == P, 0.0, mx), pix


# ---------------------------------------------------------------------------
# NCHW group-term BACKWARD: dl = (dl_elem - (sum_c dl_elem) * sm) / temp in
# ONE pure-vector kernel, with the sparse dl_elem delivered as a FLAT
# scatter buffer whose linear order IS the kernel's block order.
#
# The straightforward XLA form (scatter into (B*C, HW) or (B, C, HW) +
# elementwise chain) costs ~15 ms/step at stage-1 shapes: XLA canonicalizes
# every scatter to a FLAT f32 buffer in linear T(1024) layout, and the
# reshape to the tiled (8,128) consumer lowers as an 80-iteration serial
# dynamic-slice/DUS copy loop (while.13 + dynamic-update-slice.22 in the
# round-4/5 traces, ~10.6 ms) plus a multi-pass f32[4,20,589824] softmax
# backward chain (~4 ms). The fix exploits one layout identity: an (M, 128)
# f32 array under the default (8,128) tiling is EXACTLY row-major linear
# ((r//8)*1024 + (r%8)*128 + c == r*128 + c), so a flat buffer reshaped to
# (M, 128) is a true bitcast. The caller therefore scatters coefficients at
# cell-major flat offsets (((b*G + cell)*C + c)*CHUNK + off) and this
# kernel reads each cell's contiguous (C*CHUNK//128, 128) rows directly —
# no relayout anywhere — recomputing the per-pixel softmax in-register the
# same way the forward kernel does.
# ---------------------------------------------------------------------------


def _ssm_bwd_nchw_kernel(lg_ref, dlm_ref, out_ref, *, inv_temp):
    lg = lg_ref[0].astype(jnp.float32) * inv_temp      # (C, CHUNK)
    m = jnp.max(lg, axis=0, keepdims=True)
    e = jnp.exp(lg - m)
    p = e / jnp.sum(e, axis=0, keepdims=True)          # per-pixel softmax
    C, CH = p.shape
    # (C*CHUNK//128, 128) rows -> logical (C, CHUNK): row r of the block
    # holds flat elements [r*128, (r+1)*128) and the flat order is
    # c*CHUNK + off, so this reshape only regroups sublanes/lanes
    dlm = dlm_ref[...].reshape(C, CH)
    w = jnp.sum(dlm, axis=0, keepdims=True)            # (1, CHUNK)
    out_ref[0] = ((dlm - w * p) * inv_temp).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("temp", "interpret"))
def scatter_softmax_bwd_nchw(logits_cs, dlm_flat, temp: float,
                             interpret: bool = False):
    """(B, C<=128, HW % NCHW_CHUNK == 0) logits + (B*C*HW,) f32 flat
    dl_elem buffer in CELL-MAJOR order (flat index
    ((b*(HW//NCHW_CHUNK) + hw//NCHW_CHUNK)*C + c)*NCHW_CHUNK
    + hw%NCHW_CHUNK) -> (B, C, HW) dl in the logits dtype. See the module
    comment above for why the buffer is flat."""
    B, C, HW = logits_cs.shape
    assert HW % NCHW_CHUNK == 0, HW
    assert C <= LANES and NCHW_CHUNK % LANES == 0
    G = HW // NCHW_CHUNK
    blk_rows = C * NCHW_CHUNK // LANES
    dlm2 = dlm_flat.reshape(B * G * blk_rows, LANES)   # bitcast (see above)
    return pl.pallas_call(
        functools.partial(_ssm_bwd_nchw_kernel, inv_temp=1.0 / temp),
        grid=(B, G),
        in_specs=[
            pl.BlockSpec((1, C, NCHW_CHUNK), lambda b, i: (b, 0, i)),
            pl.BlockSpec((blk_rows, LANES), lambda b, i: (b * G + i, 0)),
        ],
        out_specs=pl.BlockSpec((1, C, NCHW_CHUNK), lambda b, i: (b, 0, i)),
        out_shape=jax.ShapeDtypeStruct((B, C, HW), logits_cs.dtype),
        interpret=interpret,
    )(logits_cs, dlm2)


@functools.partial(jax.jit, static_argnames=("R", "temp", "interpret"))
def prereduce_softmax_nchw(logits_cs, sid3, R: int, temp: float,
                           interpret: bool = False):
    """(B, C<=128, HW) logits (any float dtype; HW % NCHW_CHUNK == 0) +
    (B, 1, HW) int32 segment ids -> ((B*HW, 128) bf16 lane-padded
    softmax-prob rows with row R*i holding the per-class max over block
    rows sharing sid[R*i], (B*HW//R, C) int32 per-class winning offset).
    Softmax temperature folded in (probs of logits/temp)."""
    B, C, HW = logits_cs.shape
    assert HW % NCHW_CHUNK == 0, HW
    G = HW // NCHW_CHUNK
    out_v, out_choice = pl.pallas_call(
        functools.partial(_prereduce_nchw_kernel, R=R,
                          inv_temp=1.0 / temp),
        grid=(B, G),
        in_specs=[
            pl.BlockSpec((1, C, NCHW_CHUNK), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, 1, NCHW_CHUNK), lambda b, i: (b, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((NCHW_CHUNK, LANES),
                         lambda b, i: (b * G + i, 0)),
            pl.BlockSpec((NCHW_CHUNK // R, C),
                         lambda b, i: (b * G + i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * HW, LANES), jnp.bfloat16),
            jax.ShapeDtypeStruct((B * HW // R, C), jnp.int32),
        ],
        interpret=interpret,
    )(logits_cs, sid3.astype(jnp.int32))
    return out_v, out_choice
