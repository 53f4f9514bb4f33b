"""TPU-native segment (superpixel) reductions.

Replaces the reference's torch_scatter dependency (used throughout
/root/reference/utils/loss.py, active_selection/my_bvsb.py:73,
trainer/eval_save_cosplbl_prop.py:178) with a design built for XLA's
static-shape, dense-compute model:

  1. one `argsort` of the segment-id map per image (stable, O(P log^2 P)
     on the TPU sort unit),
  2. per-segment ranges recovered with `searchsorted` (binary search,
     O(S log P)),
  3. reductions as *segmented associative scans* (max/min/argmax) or
     cumulative-sum differences (sum/count/mean) over the sorted order,
  4. per-segment results gathered at run ends — never a scatter.

This turns every "scatter(reduce=...)" in the reference into sort + scan
+ gather — all ops XLA tiles well on TPU — and lets one sort be reused by
every reduction over the same segment map (losses need max, count; the
scorers need mean and one-hot sums; plbl needs argmax).

Masking convention: callers encode invalid pixels by setting their
segment id to `num_segments` (an overflow bucket); reductions are
reported only for buckets [0, num_segments). Absent segments report
count 0, sum 0, max `fill`, argmax `P` (the out-of-range index the
reference uses to detect empty segments,
/root/reference/utils/loss.py:202-204).

All functions are jit-, vmap-, and grad-compatible (gradients flow
through values, not through ids).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class SegContext(NamedTuple):
    """Sorted view over one flat segment-id map.

    order:      (P,)  permutation that sorts `sid` ascending (stable).
    sorted_sid: (P,)  sid[order].
    starts:     (S,)  first position of each segment in sorted order.
    ends:       (S,)  one-past-last position of each segment.
    num_segments: () int32 scalar kept only for shape checking; S is the
                  static leading dim of starts/ends.
    """

    order: jax.Array
    sorted_sid: jax.Array
    starts: jax.Array
    ends: jax.Array


def seg_context(sid: jax.Array, num_segments: int) -> SegContext:
    """Build the reduction context. `sid` is a flat (P,) int array whose
    entries lie in [0, num_segments]; the value `num_segments` marks
    invalid pixels."""
    sid = sid.reshape(-1).astype(jnp.int32)
    # one stable key-value sort yields both the sorted keys and the
    # permutation; sid[order] as a separate gather costs ~10ms per batch
    # at stage-1 shapes (latency-bound int gather)
    iota = jnp.arange(sid.shape[0], dtype=jnp.int32)
    sorted_sid, order = jax.lax.sort((sid, iota), dimension=0,
                                     is_stable=True, num_keys=1)
    seg_ids = jnp.arange(num_segments, dtype=jnp.int32)
    ends = jnp.searchsorted(sorted_sid, seg_ids, side="right").astype(jnp.int32)
    # ids are integers >= 0, so left[s] == right[s-1]; one binary search pass
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends[:-1]])
    return SegContext(order=order, sorted_sid=sorted_sid, starts=starts, ends=ends)


def seg_valid(ctx: SegContext) -> jax.Array:
    """(S,) bool — segment has at least one (valid) member pixel."""
    return ctx.ends > ctx.starts


def seg_count(ctx: SegContext) -> jax.Array:
    """(S,) int32 — member-pixel count per segment."""
    return ctx.ends - ctx.starts


def _as_2d(values: jax.Array):
    """(P,) -> (P, 1) plus a squeeze flag."""
    if values.ndim == 1:
        return values[:, None], True
    if values.ndim == 2:
        return values, False
    raise ValueError(f"values must be (P,) or (P, C), got {values.shape}")


def seg_sum(ctx: SegContext, values: jax.Array) -> jax.Array:
    """Per-segment sum. values (P,) or (P, C) -> (S,) or (S, C).

    Integer inputs use an exact int32 cumulative sum; floats use an f32
    cumsum (difference-of-prefix-sums; relative error ~1e-6 * P which is
    well inside training noise).
    """
    v, squeeze = _as_2d(values)
    g = jnp.take(v, ctx.order, axis=0)
    if jnp.issubdtype(g.dtype, jnp.integer) or g.dtype == jnp.bool_:
        g = g.astype(jnp.int32)
    else:
        g = g.astype(jnp.float32)
    c = jnp.cumsum(g, axis=0)
    # prefix[i] = sum of first i sorted elements; pad a zero row in front.
    zero = jnp.zeros((1, g.shape[1]), dtype=c.dtype)
    prefix = jnp.concatenate([zero, c], axis=0)
    out = prefix[ctx.ends] - prefix[ctx.starts]
    return out[:, 0] if squeeze else out


def seg_mean(ctx: SegContext, values: jax.Array, fill: float = 0.0) -> jax.Array:
    """Per-segment mean; absent segments -> `fill` (torch_scatter
    scatter(reduce='mean') reports 0 for absent ids,
    /root/reference/active_selection/my_bvsb.py:73)."""
    s = seg_sum(ctx, values)
    n = seg_count(ctx)
    n_b = n[:, None] if s.ndim == 2 else n
    mean = s / jnp.maximum(n_b, 1).astype(s.dtype)
    valid = (n_b > 0)
    return jnp.where(valid, mean, jnp.asarray(fill, dtype=s.dtype))


def _segmented_scan(vals: jax.Array, flags: jax.Array, reverse_max: bool):
    """Inclusive segmented max-scan over sorted values.

    vals  (P, C) float; flags (P, 1) bool marking run starts.
    Monoid: (v_a, f_a) * (v_b, f_b) = (f_b ? v_b : op(v_a, v_b), f_a|f_b).
    """
    op = jnp.minimum if reverse_max else jnp.maximum

    def comb(a, b):
        va, fa = a
        vb, fb = b
        v = jnp.where(fb, vb, op(va, vb))
        f = jnp.logical_or(fa, fb)
        return v, f

    v, _ = lax.associative_scan(comb, (vals, flags), axis=0)
    return v


def _run_start_flags(ctx: SegContext) -> jax.Array:
    s = ctx.sorted_sid
    first = jnp.ones((1,), dtype=bool)
    rest = s[1:] != s[:-1]
    return jnp.concatenate([first, rest])[:, None]


def _seg_extreme(ctx, values, fill, reverse):
    v, squeeze = _as_2d(values)
    g = jnp.take(v, ctx.order, axis=0).astype(jnp.float32)
    flags = _run_start_flags(ctx)
    scanned = _segmented_scan(g, flags, reverse_max=reverse)
    # run end of segment s sits at ends[s]-1 (valid only when count>0)
    idx = jnp.maximum(ctx.ends - 1, 0)
    out = scanned[idx]
    valid = seg_valid(ctx)
    out = jnp.where(valid[:, None], out, jnp.asarray(fill, dtype=out.dtype))
    return out[:, 0] if squeeze else out


def seg_max(ctx: SegContext, values: jax.Array, fill: float = 0.0) -> jax.Array:
    """Per-segment max; absent segments -> `fill` (torch_scatter
    scatter(reduce='max') leaves absent rows at 0,
    /root/reference/utils/loss.py:122-123)."""
    return _seg_extreme(ctx, values, fill, reverse=False)


def seg_min(ctx: SegContext, values: jax.Array, fill: float = 0.0) -> jax.Array:
    return _seg_extreme(ctx, values, fill, reverse=True)


def seg_max_argmax(ctx: SegContext, values: jax.Array, fill: float = 0.0):
    """Per-segment (max, argmax-into-original-P).

    Matches torch_scatter.scatter_max semantics the reference relies on:
    absent segments get value `fill` and index == P (out of range), used
    as the validity test at /root/reference/utils/loss.py:204.
    Ties resolve to the earliest pixel in sorted order.
    """
    v, squeeze = _as_2d(values)
    P = v.shape[0]
    g = jnp.take(v, ctx.order, axis=0).astype(jnp.float32)
    flags = _run_start_flags(ctx)
    # original pixel index of each sorted row, broadcast across C
    pix = ctx.order.astype(jnp.int32)[:, None] * jnp.ones((1, g.shape[1]), jnp.int32)

    def comb(a, b):
        va, ia, fa = a
        vb, ib, fb = b
        take_b = jnp.logical_or(fb, vb > va)
        v_ = jnp.where(fb, vb, jnp.maximum(va, vb))
        i_ = jnp.where(take_b, ib, ia)
        f_ = jnp.logical_or(fa, fb)
        return v_, i_, f_

    sv, si, _ = lax.associative_scan(comb, (g, pix, flags), axis=0)
    idx = jnp.maximum(ctx.ends - 1, 0)
    out_v = sv[idx]
    out_i = si[idx]
    valid = seg_valid(ctx)[:, None]
    out_v = jnp.where(valid, out_v, jnp.asarray(fill, dtype=out_v.dtype))
    out_i = jnp.where(valid, out_i, jnp.asarray(P, dtype=jnp.int32))
    if squeeze:
        return out_v[:, 0], out_i[:, 0]
    return out_v, out_i


# ---------------------------------------------------------------------------
# One-shot wrappers with torch_scatter-style signatures (build the context
# internally). Prefer building one SegContext and reusing it when several
# reductions share a segment map.
# ---------------------------------------------------------------------------

def _masked_sid(sid, mask, num_segments):
    sid = sid.reshape(-1).astype(jnp.int32)
    if mask is not None:
        sid = jnp.where(mask.reshape(-1), sid, num_segments)
    return sid


def scatter_sum(values, sid, num_segments, mask=None):
    ctx = seg_context(_masked_sid(sid, mask, num_segments), num_segments)
    return seg_sum(ctx, values)


def scatter_mean(values, sid, num_segments, mask=None, fill=0.0):
    ctx = seg_context(_masked_sid(sid, mask, num_segments), num_segments)
    return seg_mean(ctx, values, fill=fill)


def scatter_max(values, sid, num_segments, mask=None, fill=0.0, return_argmax=False):
    ctx = seg_context(_masked_sid(sid, mask, num_segments), num_segments)
    if return_argmax:
        return seg_max_argmax(ctx, values, fill=fill)
    return seg_max(ctx, values, fill=fill)


# ---------------------------------------------------------------------------
# Gradient-ready segment max with a cheap backward and a Pallas forward.
#
# Autodiff through the associative scan re-materializes the (P, C) array at
# every scan level in the backward pass (measured 940 ms per stage-1 step on
# TPU v5e). The VJP of segment-max is just "route the cotangent to the argmax
# pixel", a single dense gather-compare, so we define it by hand; on TPU the
# forward runs the single-pass Pallas kernel (ops/segment_pallas.py).
# ---------------------------------------------------------------------------

import os as _os


def _pallas_available() -> bool:
    if _os.environ.get("MULACTSEG_NO_PALLAS"):
        return False
    if _os.environ.get("MULACTSEG_FORCE_PALLAS_INTERPRET"):
        # CPU tests of the TPU-only code path (kernels run interpreted)
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _pallas_interpret() -> bool:
    return bool(_os.environ.get("MULACTSEG_FORCE_PALLAS_INTERPRET"))


def _seg_max_argmax_impl(values, sid, num_segments):
    """(max (S,C) fill=0, argmax-pixel (S,C) fill=P)."""
    sid = sid.reshape(-1).astype(jnp.int32)
    if _pallas_available() and values.ndim == 2 and values.shape[1] <= 128:
        from mulactseg_tpu.ops.segment_pallas import LANES, segment_max_pallas

        ctx = seg_context(sid, num_segments)
        P, C = values.shape
        # pad to full 128-lane rows BEFORE the gather: aligned 512-byte row
        # gathers are ~2.5x faster on TPU than 80-byte rows
        v = values.astype(jnp.float32)
        if C < LANES:
            # barrier stops XLA from rewriting take(pad(v)) back into
            # pad(take(v)) and losing the aligned-row gather (2.5x slower)
            v = jax.lax.optimization_barrier(
                jnp.pad(v, ((0, 0), (0, LANES - C))))
        g = jnp.take(v, ctx.order, axis=0)
        vals, pos = segment_max_pallas(g, ctx.starts, ctx.ends, fill=0.0,
                                       interpret=_pallas_interpret())
        vals, pos = vals[:, :C], pos[:, :C]
        order_pad = jnp.concatenate(
            [ctx.order.astype(jnp.int32), jnp.full((1,), P, jnp.int32)])
        pix = order_pad[jnp.clip(pos, 0, P)]
        return vals, pix
    ctx = seg_context(sid, num_segments)
    return seg_max_argmax(ctx, values, fill=0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def segment_max_grad(values, sid, num_segments):
    """Differentiable segment max: values (P, C), sid (P,) with invalid
    pixels marked as num_segments. Returns (max (S,C), argmax_pixel (S,C));
    absent segments give (0, P). Gradient flows only to argmax pixels."""
    return _seg_max_argmax_impl(values, sid, num_segments)


def _smg_fwd(values, sid, num_segments):
    out, argpix = _seg_max_argmax_impl(values, sid, num_segments)
    return (out, argpix), (sid.reshape(-1), argpix, values.shape[0])


def _smg_bwd(num_segments, res, cts):
    g, _ = cts  # argmax output carries no useful cotangent
    sid, argpix, P = res
    sid_c = jnp.clip(sid, 0, num_segments - 1)
    C = g.shape[-1]
    if 2 * C <= 128:
        # pack (cotangent, argmax) into one aligned 128-lane row so the
        # per-pixel lookup is a single fast gather (see the forward's
        # aligned-gather note)
        packed = jnp.concatenate(
            [g.astype(jnp.float32),
             jax.lax.bitcast_convert_type(argpix, jnp.float32)], axis=1)
        packed = jax.lax.optimization_barrier(
            jnp.pad(packed, ((0, 0), (0, 128 - 2 * C))))
        rows = jnp.take(packed, sid_c, axis=0)  # (P, 128)
        g_rows = rows[:, :C]
        arg_rows = jax.lax.bitcast_convert_type(rows[:, C:2 * C], jnp.int32)
    else:
        arg_rows = jnp.take(argpix, sid_c, axis=0)
        g_rows = jnp.take(g, sid_c, axis=0)
    pix = jnp.arange(P, dtype=jnp.int32)[:, None]
    live = (arg_rows == pix) & (sid < num_segments)[:, None]
    dv = jnp.where(live, g_rows, 0.0).astype(jnp.float32)
    return dv, None


segment_max_grad.defvjp(_smg_fwd, _smg_bwd)


# ---------------------------------------------------------------------------
# Softmax-fused segment max with a SPARSE backward.
#
# The group (MIL) loss needs max_{p in segment} softmax(l_p)[c]. Composing
# softmax + segment_max_grad materializes the (P, C) probability array in
# HBM twice (forward softmax pass + gathered sorted copy) and the backward
# builds a dense (P, C) mask. This op instead gathers temperature-scaled
# LOGITS into sorted order, softmaxes each row inside the Pallas kernel,
# and — because only the S*C argmax pixels carry gradient — the backward
# recomputes the softmax jacobian at just those rows and scatter-adds them,
# so no dense (P, C) intermediate exists outside the one sorted gather.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def segment_softmax_max(scaled_logits, sid, num_segments):
    """scaled_logits: (P, C) f32 = logits / temp; sid: (P,) int32 with
    invalid pixels marked as num_segments. probs = softmax(scaled_logits)
    per pixel; returns ((S, C) max prob, (S, C) argmax pixel index).
    Absent segments -> (0, P). Gradients flow to scaled_logits through the
    softmax at the argmax pixels only."""
    return _ssm_impl(scaled_logits, sid, num_segments)


_BLOCK = 4  # raster-block pre-reduction width (see below)


def _use_prereduce() -> bool:
    """Raster-block pre-reduction cuts the gathered-row count ~3x but adds
    a softmax/merge kernel pass; on the current chip the two roughly
    cancel (22.4 vs 23.7 img/s at stage-1 shapes), so the simpler
    gather-logits path is the default. Kept switchable for re-evaluation
    on other TPU generations (a higher HBM-latency : bandwidth ratio
    favors it)."""
    return _os.environ.get("MULACTSEG_SSM_PREREDUCE", "0") == "1"


def _ssm_impl(scaled_logits, sid, num_segments):
    sid = sid.reshape(-1).astype(jnp.int32)
    P, C = scaled_logits.shape
    if _pallas_available() and C <= 128 and not _use_prereduce():
        from mulactseg_tpu.ops.segment_pallas import (
            LANES,
            segment_softmax_max_pallas,
        )

        ctx = seg_context(sid, num_segments)
        # bf16 through the pad+gather+kernel stream: the row gather is
        # latency-bound (same time at half the bytes) but the pad write
        # and the kernel's chunk DMAs halve; softmax runs f32 in-register
        v = scaled_logits.astype(jnp.bfloat16)
        if C < LANES:
            # pad BEFORE the gather: aligned rows gather ~2.5x faster;
            # the barrier stops XLA undoing pad(take(...))
            v = jax.lax.optimization_barrier(
                jnp.pad(v, ((0, 0), (0, LANES - C))))
        CH = int(_os.environ.get("MULACTSEG_GATHER_CHUNK", "65536"))
        n_valid = ctx.ends[-1]
        P_pad = (P + CH - 1) // CH * CH
        order_p = jnp.pad(ctx.order, (0, P_pad - P))

        def gather_chunk(c, _):
            base = c * CH
            idx = jax.lax.dynamic_slice(order_p, (base,), (CH,))
            blk = jax.lax.cond(
                base < n_valid,
                lambda: jnp.take(v, idx, axis=0),
                lambda: jnp.zeros((CH, v.shape[1]), v.dtype))
            return c + 1, blk

        _, g = jax.lax.scan(gather_chunk, 0, None, length=P_pad // CH)
        g = g.reshape(P_pad, v.shape[1])[:P]
        vals, pos = segment_softmax_max_pallas(
            g, ctx.starts, ctx.ends, num_classes=C,
            interpret=_pallas_interpret())
        vals, pos = vals[:, :C], pos[:, :C]
        order_pad = jnp.concatenate(
            [ctx.order.astype(jnp.int32), jnp.full((1,), P, jnp.int32)])
        pix = order_pad[jnp.clip(pos, 0, P)]
        return vals, pix
    if _pallas_available() and C <= 128:
        from mulactseg_tpu.ops.segment_pallas import (
            LANES,
            segment_max_pallas,
        )

        # The sorted row gather is LATENCY-bound (~13.5 ns/row measured,
        # f32 == bf16 time), so the only lever is fewer rows. Superpixels
        # are contiguous blobs: in raster order a block of 4 consecutive
        # pixels usually has ONE sid, so per-pixel softmax probs (f32 —
        # exact reference numerics) are pre-reduced per raster block:
        # row 4i holds the per-class max over the block's rows that share
        # sid[4i] (choice index saved for argmax mapping), rows that
        # matched are retired to the invalid bucket, rows with other sids
        # stay as themselves. The stable sid-sort then sends retired rows
        # to the trailing bucket the chunked gather already skips —
        # typically >2.5x fewer gathered rows. First-max tie-break is
        # preserved: argmax over the block picks the lowest offset, and
        # block rows keep raster order under the stable sort.
        from mulactseg_tpu.ops.segment_pallas import (
            PRE_CHUNK,
            prereduce_softmax_blocks,
        )

        R = _BLOCK
        P_r = (P + PRE_CHUNK - 1) // PRE_CHUNK * PRE_CHUNK
        lg = scaled_logits
        if P_r != P:
            lg = jnp.pad(lg, ((0, P_r - P), (0, 0)))
            sid = jnp.pad(sid, (0, P_r - P), constant_values=num_segments)
        # one-pass Pallas kernel: softmax + same-sid block merge + lane
        # pad (bf16 out — the old path gathered bf16 scaled logits, so
        # rounding precision is unchanged). The same chain in XLA costs
        # ~8 ms/step in separate materialized passes.
        v, choice = prereduce_softmax_blocks(lg.astype(jnp.float32), sid, R,
                                             num_segments,
                                             interpret=_pallas_interpret())
        sb = sid.reshape(P_r // R, R)
        eq = sb == sb[:, :1]
        col0s = (jnp.arange(R, dtype=jnp.int32) == 0)[None, :]
        sid2 = jnp.where(col0s, sb,
                         jnp.where(eq, num_segments, sb)).reshape(P_r)

        ctx = seg_context(sid2, num_segments)
        v = jax.lax.optimization_barrier(v)
        # Sorted order puts every retired/invalid row in a trailing
        # bucket; gather in chunks and skip chunks entirely inside it.
        # One extra all-zero chunk gives the run-walking kernel its DMA
        # overrun margin, so the scan output feeds it with NO slice/pad
        # copy in between.
        CH = int(_os.environ.get("MULACTSEG_GATHER_CHUNK", "65536"))
        n_valid = ctx.ends[-1]
        P_pad = (P_r + CH - 1) // CH * CH + CH
        order_p = jnp.pad(ctx.order, (0, P_pad - P_r))

        def gather_chunk(c, _):
            base = c * CH
            idx = jax.lax.dynamic_slice(order_p, (base,), (CH,))
            blk = jax.lax.cond(
                base < n_valid,
                lambda: jnp.take(v, idx, axis=0),
                lambda: jnp.zeros((CH, v.shape[1]), v.dtype))
            return c + 1, blk

        _, g = jax.lax.scan(gather_chunk, 0, None, length=P_pad // CH)
        g = g.reshape(P_pad, v.shape[1])
        vals, pos = segment_max_pallas(g, ctx.starts, ctx.ends, fill=0.0,
                                       interpret=_pallas_interpret(),
                                       pre_padded=True)
        vals, pos = vals[:, :C], pos[:, :C]
        order_pad = jnp.concatenate(
            [ctx.order.astype(jnp.int32), jnp.full((1,), P_r, jnp.int32)])
        pix2 = order_pad[jnp.clip(pos, 0, P_r)]  # pre-reduced row index
        # map merged rows back to the winning original pixel via the
        # saved per-class choice
        blk_i = pix2 // R
        off = pix2 % R
        csel = jnp.take(
            choice.reshape(-1).astype(jnp.int32),
            jnp.clip(blk_i, 0, P_r // R - 1) * C +
            jnp.arange(C, dtype=jnp.int32)[None, :])
        pix = jnp.where(pix2 >= P_r, P,
                        jnp.where(off == 0, blk_i * R + csel, pix2))
        pix = jnp.minimum(pix, P)
        return vals, pix
    # CPU / fallback: dense softmax + scan-based segment max
    probs = jax.nn.softmax(scaled_logits.astype(jnp.float32), axis=-1)
    ctx = seg_context(sid, num_segments)
    return seg_max_argmax(ctx, probs, fill=0.0)


def _ssm_fwd(scaled_logits, sid, num_segments):
    vals, pix = _ssm_impl(scaled_logits, sid, num_segments)
    return (vals, pix), (scaled_logits, vals, pix)


def _ssm_bwd(num_segments, res, cts):
    """d max_prob / d logits at the argmax pixel is p_c * (one_hot(c) - p).
    Instead of scattering (S*C, C) ROWS (lowers to a serialized while loop
    on TPU), split into (a) a scalar scatter of +coef at the flat element
    index (pix, c) — these are unique by construction since a pixel
    belongs to one segment — and (b) a rank-1 term -w[p] * softmax(u[p])
    with w from a second scalar scatter, applied as one dense fused
    elementwise pass. p_c IS the forward's max value (vals), so no row
    gather is needed (the (S*C,) 80-byte-row gather was ~5 ms/step)."""
    g, _ = cts  # (S, C) cotangent of the max probs
    scaled_logits, vals, pix = res
    P, C = scaled_logits.shape
    flat_pix = pix.reshape(-1)
    safe = jnp.clip(flat_pix, 0, P - 1)
    cls = jnp.tile(jnp.arange(C, dtype=jnp.int32), pix.shape[0])
    p_c = vals.reshape(-1)
    live = (flat_pix < P) & (g.reshape(-1) != 0.0)
    coef = jnp.where(live, g.reshape(-1) * p_c, 0.0)
    tgt = jnp.where(live, safe, P)  # dead entries -> OOB, dropped
    # element indices are unique (a pixel belongs to one segment, one
    # entry per class); OOB drop avoids a (P+1)-row buffer + slice copy.
    # 2-D scatter, not flat-(P*C,)-then-reshape: the flat buffer's
    # relayout to (P, C) tiling lowers as a serial DUS copy loop on TPU
    # (see _ssm_nchw_bwd).
    dl_elem = jnp.zeros((P, C), jnp.float32).at[tgt, cls].add(
        coef, mode="drop", unique_indices=True)
    # w as the row-sum of dl_elem, not a second scatter: the pixel-index
    # scatter has DUPLICATE targets (several classes of a segment can
    # share an argmax pixel) and lowers to a serial loop on TPU (~5.6
    # ms/step measured on the NCHW twin); the reduce fuses into the dl
    # pass that reads dl_elem anyway.
    w = jnp.sum(dl_elem, axis=1, keepdims=True)
    dl = dl_elem - w * jax.nn.softmax(
        scaled_logits.astype(jnp.float32), axis=-1)
    return dl.astype(scaled_logits.dtype), None


segment_softmax_max.defvjp(_ssm_fwd, _ssm_bwd)


def seg_sum_onehot_matmul(values: jax.Array, sid: jax.Array, num_segments: int,
                          chunk: int = 4096) -> jax.Array:
    """Alternative exact segment-sum on the MXU: chunked one-hot matmul
    one_hot(sid).T @ values. Used as a cross-check and for cases where a
    sort is not already amortized. values (P, C) float."""
    v, squeeze = _as_2d(values)
    P, C = v.shape
    pad = (-P) % chunk
    if pad:
        v = jnp.pad(v, ((0, pad), (0, 0)))
        sid = jnp.pad(sid.reshape(-1), (0, pad), constant_values=num_segments)
    v = v.reshape(-1, chunk, C).astype(jnp.float32)
    sid = sid.reshape(-1, chunk)

    def body(acc, xs):
        vals, ids = xs
        oh = jax.nn.one_hot(ids, num_segments, dtype=jnp.float32)  # (chunk, S)
        acc = acc + jnp.einsum("ps,pc->sc", oh, vals,
                               precision=lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)
        return acc, None

    init = jnp.zeros((num_segments, C), jnp.float32)
    out, _ = lax.scan(body, init, (v, sid))
    return out[:, 0] if squeeze else out


# ---------------------------------------------------------------------------
# NCHW-input segment softmax-max: the group term fed straight from the
# model's native logits layout.
#
# The row-major path above needs scaled (P, C) rows — from NCHW logits
# that costs a relayout copy + lane-padded pre-gather pad. Here the
# pre-reduction kernel (ops/segment_pallas.prereduce_softmax_nchw) reads
# (B, C, HW) directly, does softmax + raster-block merge + lane-pad in
# one pass, and the sorted gather then touches ~R-fold fewer rows. The
# backward is the same gather-free scatter pair as _ssm_bwd, oriented
# NCHW so the cotangent leaves in the logits' own layout.
# ---------------------------------------------------------------------------


def _packed_per_image_sort(sid2, B, HW, nseg):
    """Per-image packed sort of the (retired) segment-id map.

    The global path stable-sorts P (key, iota) int32 pairs. Here each
    image's rows get one uint32 word `local_sid << pix_bits | local_pix`
    and a batched single-key sort over (B, HW) runs instead: half the
    sorted bytes, no stability machinery (keys are unique — the pixel
    bits tie-break exactly like the stable sort's iota), and the
    concatenated per-image results are globally sorted because global
    sid = b*nseg + local is monotone in (b, local).

    Returns (order (P,) int32 global pixel order, starts (S,), ends (S,),
    n_valid_img (B,) int32 count of non-retired rows per image block).
    Requires sid2's invalid marker == B*nseg and
    (HW-1).bit_length() + nseg.bit_length() <= 32 (caller checks).

    Measured on the v5e-lite tunnel chip at stage-1 shapes: 28.94 vs
    29.49 img/s for the global stable kv-sort — the batched dimension-1
    sort lowers WORSE than one long 1D sort there, so this is opt-in
    (MULACTSEG_PERIMAGE_SORT=1) for re-evaluation on other TPU
    generations.
    """
    pix_bits = (HW - 1).bit_length()
    local = sid2.reshape(B, HW)
    offs = (jnp.arange(B, dtype=jnp.int32) * nseg)[:, None]
    local = jnp.where(local < B * nseg, local - offs, nseg).astype(jnp.uint32)
    pix = jax.lax.broadcasted_iota(jnp.uint32, (B, HW), 1)
    packed = (local << pix_bits) | pix
    (packed,) = jax.lax.sort((packed,), dimension=1, is_stable=False,
                             num_keys=1)
    img_off = (jnp.arange(B, dtype=jnp.int32) * HW)[:, None]
    order = (packed & jnp.uint32((1 << pix_bits) - 1)).astype(jnp.int32)
    order = (order + img_off).reshape(-1)
    bounds = jnp.arange(nseg + 1, dtype=jnp.uint32) << pix_bits
    bnd = jax.vmap(lambda row: jnp.searchsorted(row, bounds,
                                                side="left"))(packed)
    bnd = bnd.astype(jnp.int32)
    starts = (bnd[:, :nseg] + img_off).reshape(-1)
    ends = (bnd[:, 1:] + img_off).reshape(-1)
    return order, starts, ends, bnd[:, nseg]


def _ssm_nchw_impl(logits_cs, sid, num_segments, temp):
    from mulactseg_tpu.ops.segment_pallas import (
        NCHW_CHUNK,
        prereduce_softmax_nchw,
        scatter_softmax_max_nchw,
        segment_max_pallas,
    )

    B, C, HW = logits_cs.shape
    P = B * HW
    if (_os.environ.get("MULACTSEG_NCHW_SCATTER", "1") != "0"
            and num_segments + 1 <= 9216):
        # sort-free path: softmax + run merge + VMEM scatter-max in one
        # kernel (segment_pallas.scatter_softmax_max_nchw) — no (P, 128)
        # gather source in HBM, no key sort, no latency-bound gather.
        # DEFAULT ON: measured 34.12 img/s vs 29.67 with the sorted
        # pipeline on the real v5e (2026-08-19, /tmp/r4_scatter_bench.log,
        # BASELINE.md round-4 knob table). Set MULACTSEG_NCHW_SCATTER=0
        # to fall back to the sorted pipeline.
        # The S guard keeps the kernel's VMEM-resident accumulator pair
        # (2 x (S_pad, 128) x 4 B = S_pad KiB) within ~9 MB of the chip's
        # ~16 MB VMEM alongside ~4 MB of scratch/blocks; larger segment
        # counts (e.g. mseg small_nseg) fall back to the sorted pipeline
        dbl = int(_os.environ.get("MULACTSEG_NCHW_SCATTER_DBL", "6"))
        return scatter_softmax_max_nchw(
            logits_cs, sid.reshape(B, 1, HW), temp, num_segments,
            interpret=_pallas_interpret(), dbl=dbl)
    # merge width (O(R) lane rolls in the kernel). R=16 retires ~4x more
    # rows than R=4 before the sorted gather but measured EQUAL end-to-end
    # (29.00 vs 28.99 img/s): past R=4 the group term is bounded by the
    # run-walk kernel + key sort, not the gather. Env knob kept for
    # hardware with a different gather-latency balance
    R = int(_os.environ.get("MULACTSEG_NCHW_PRERED_R", "4"))
    sid = sid.reshape(-1).astype(jnp.int32)
    v, choice = prereduce_softmax_nchw(
        logits_cs, sid.reshape(B, 1, HW), R, temp,
        interpret=_pallas_interpret())
    # retire merged rows: within each R-block, rows matching the leader's
    # sid (other than the leader itself) go to the dummy bucket
    sb = sid.reshape(P // R, R)
    eq = sb == sb[:, :1]
    col0s = (jnp.arange(R, dtype=jnp.int32) == 0)[None, :]
    sid2 = jnp.where(col0s, sb,
                     jnp.where(eq, num_segments, sb)).reshape(P)

    v = jax.lax.optimization_barrier(v)
    CH = int(_os.environ.get("MULACTSEG_GATHER_CHUNK", "65536"))
    nseg_l = num_segments // B
    pix_bits = (HW - 1).bit_length()
    if (num_segments == B * nseg_l and HW % CH == 0
            and pix_bits + nseg_l.bit_length() <= 32
            and _os.environ.get("MULACTSEG_PERIMAGE_SORT") == "1"):
        order, starts, ends, nv_img = _packed_per_image_sort(
            sid2, B, HW, nseg_l)

        def chunk_live(base):
            # CH divides HW, so each gather chunk lies inside one image
            # block; live iff it starts before that image's retired tail
            b = base // HW
            nv = jax.lax.dynamic_index_in_dim(nv_img, b, keepdims=False)
            return (base < P) & (base - b * HW < nv)
    else:
        ctx = seg_context(sid2, num_segments)
        order, starts, ends = ctx.order, ctx.starts, ctx.ends
        n_valid = ctx.ends[-1]

        def chunk_live(base):
            return base < n_valid

    P_pad = (P + CH - 1) // CH * CH + CH
    order_p = jnp.pad(order, (0, P_pad - P))

    def gather_chunk(c, _):
        base = c * CH
        idx = jax.lax.dynamic_slice(order_p, (base,), (CH,))
        blk = jax.lax.cond(
            chunk_live(base),
            lambda: jnp.take(v, idx, axis=0),
            lambda: jnp.zeros((CH, v.shape[1]), v.dtype))
        return c + 1, blk

    _, g = jax.lax.scan(gather_chunk, 0, None, length=P_pad // CH)
    g = g.reshape(P_pad, v.shape[1])
    vals, pos = segment_max_pallas(g, starts, ends, fill=0.0,
                                   interpret=_pallas_interpret(),
                                   pre_padded=True)
    vals, pos = vals[:, :C], pos[:, :C]
    order_pad = jnp.concatenate(
        [order.astype(jnp.int32), jnp.full((1,), P, jnp.int32)])
    pix2 = order_pad[jnp.clip(pos, 0, P)]  # pre-reduced row index
    blk_i = pix2 // R
    off = pix2 % R
    csel = jnp.take(
        choice.reshape(-1).astype(jnp.int32),
        jnp.clip(blk_i, 0, P // R - 1) * C +
        jnp.arange(C, dtype=jnp.int32)[None, :])
    pix = jnp.where(pix2 >= P, P,
                    jnp.where(off == 0, blk_i * R + csel, pix2))
    pix = jnp.minimum(pix, P)
    return vals, pix


def _ssm_nchw_dense(logits_cs, sid, num_segments, temp):
    """CPU / fallback: dense softmax over the class axis + scan-based
    segment max (same semantics, no kernels)."""
    B, C, HW = logits_cs.shape
    probs = jax.nn.softmax(logits_cs.astype(jnp.float32) / temp, axis=1)
    rows = jnp.swapaxes(probs, 1, 2).reshape(B * HW, C)
    ctx = seg_context(sid.reshape(-1).astype(jnp.int32), num_segments)
    return seg_max_argmax(ctx, rows, fill=0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def segment_softmax_max_nchw(logits_cs, sid, num_segments, temp):
    """(B, C, HW) logits (native NCHW view) + (B*HW,) segment ids ->
    ((S, C) max softmax(logits/temp) prob per segment/class, (S, C)
    argmax pixel index with P as the absent-segment marker). Same
    semantics as segment_softmax_max(scaled_rows, sid, S) with the
    temperature folded in.

    Contract (the batch-folded layout lossdecomp_fused produces): rows of
    image b carry sids in {b*nseg, ..., (b+1)*nseg - 1} or the invalid
    marker num_segments, with nseg = num_segments // B — the per-image
    packed sort relies on it."""
    HW = logits_cs.shape[2]
    from mulactseg_tpu.ops.segment_pallas import NCHW_CHUNK

    if _pallas_available() and logits_cs.shape[1] <= 128 \
            and HW % NCHW_CHUNK == 0:
        return _ssm_nchw_impl(logits_cs, sid, num_segments, temp)
    return _ssm_nchw_dense(logits_cs, sid, num_segments, temp)


def _ssm_nchw_fwd(logits_cs, sid, num_segments, temp):
    vals, pix = segment_softmax_max_nchw(logits_cs, sid, num_segments, temp)
    return (vals, pix), (logits_cs, vals, pix)


def _ssm_nchw_bwd(num_segments, temp, res, cts):
    """Same gather-free scatter pair as _ssm_bwd (p_c at the argmax IS
    the forward max value), with element indices mapped into the NCHW
    flat order and the 1/temp chain applied for the in-kernel scaling."""
    g, _ = cts
    logits_cs, vals, pix = res
    B, C, HW = logits_cs.shape
    P = B * HW
    flat_pix = pix.reshape(-1)
    safe = jnp.clip(flat_pix, 0, P - 1)
    cls = jnp.tile(jnp.arange(C, dtype=jnp.int32), pix.shape[0])
    p_c = vals.reshape(-1)
    live = (flat_pix < P) & (g.reshape(-1) != 0.0)
    coef = jnp.where(live, g.reshape(-1) * p_c, 0.0)
    b = safe // HW
    hw = safe % HW
    from mulactseg_tpu.ops.segment_pallas import NCHW_CHUNK

    if _pallas_available() and C <= 128 and HW % NCHW_CHUNK == 0:
        # one-kernel backward (segment_pallas.scatter_softmax_bwd_nchw):
        # coefficients scatter into a FLAT buffer in the kernel's
        # cell-major block order, so the scatter's linear T(1024) output
        # is bitcast-readable by the kernel — no tiled relayout (the
        # 2-D/3-D scatter forms all canonicalize to flat + an
        # 80-iteration serial DUS copy loop, ~10.6 ms/step at stage-1
        # shapes) and no multi-pass XLA softmax-backward chain (~4 ms).
        from mulactseg_tpu.ops.segment_pallas import (
            scatter_softmax_bwd_nchw,
        )

        G = HW // NCHW_CHUNK
        cell = hw // NCHW_CHUNK
        off = hw % NCHW_CHUNK
        tgt = ((b * G + cell) * C + cls) * NCHW_CHUNK + off
        tgt = jnp.where(live, tgt, B * C * HW)  # dead -> OOB, dropped
        flat = jnp.zeros((B * C * HW,), jnp.float32).at[tgt].add(
            coef, mode="drop", unique_indices=True)
        dl = scatter_softmax_bwd_nchw(logits_cs, flat, temp,
                                      interpret=_pallas_interpret())
        return dl, None
    # dense fallback (CPU / odd shapes): 2-D scatter + elementwise chain
    row = jnp.where(live, b * C + cls, B * C)  # dead -> OOB, dropped
    dl_elem = jnp.zeros((B * C, HW), jnp.float32).at[row, hw].add(
        coef, mode="drop", unique_indices=True).reshape(B, C, HW)
    # w[p] = sum_c coef at p's entries == class-sum of dl_elem. A direct
    # scatter of coef at pixel indices has DUPLICATES (several classes of
    # a segment can share an argmax pixel), and non-unique scatters lower
    # to a SERIAL while loop on TPU (~5.6 ms/step measured); the dense
    # reduce fuses into the dl pass that reads dl_elem anyway.
    w = jnp.sum(dl_elem, axis=1, keepdims=True)
    sm = jax.nn.softmax(logits_cs.astype(jnp.float32) / temp, axis=1)
    dl = (dl_elem - w * sm) * (1.0 / temp)
    return dl.astype(logits_cs.dtype), None


segment_softmax_max_nchw.defvjp(_ssm_nchw_fwd, _ssm_nchw_bwd)
