"""Pallas TPU kernel for the per-pixel partial-label CE/MC terms.

The lossdecomp CE and MC terms (losses/fused.py) are per-pixel functions
of (logits row, candidate bitmask): softmax -> merged-positive prob ->
NLL, bucketed by one-hot vs multi-hot candidate count, reduced to four
scalars (sum + count per bucket). XLA computes this as several dense
(B*P, C) passes whose intermediates are lane-padded 20 -> 128 (6.4x the
bytes) and saves residuals for the backward; measured ~47 ms of a 216 ms
stage-1 step. This kernel streams the logits in natural pixel order
(sequential DMA, no gather), computes everything in-register, and the
backward recomputes from the same inputs — HBM traffic becomes one read
of (N, C) + bits forward and one read + one (N, C) write backward
(~speed of light for the op).

Semantics match losses/partial.onehot_ce_multihot_choice exactly
(trainer/active_joint_multi_predignore_lossdecomp.py:16-72): nll =
-log(sum_{c in candidates} softmax(l/T)_c + 1e-8), one-hot and multi-hot
sums/counts returned separately (normalizers 1 + count applied by the
caller).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-8
# pixel rows per grid program. Physical VMEM tiles pad the lane dim to
# 128, so a (ROWS, C~20) f32 block really occupies ROWS*128*4 bytes; 2048
# keeps x + bits + out double-buffered well under the 16 MB scoped limit.
ROWS = 2048


def _softmax_pos(x, bits, C, temp):
    """All intermediates stay 2-D (Mosaic relayout of 1-D vectors is
    fragile); pos/n come back as (ROWS, 1)."""
    u = x.astype(jnp.float32) / temp
    m = jnp.max(u, axis=1, keepdims=True)
    e = jnp.exp(u - m)
    z = jnp.sum(e, axis=1, keepdims=True)
    p = e / z
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    t = ((bits >> lane) & 1).astype(jnp.float32)
    pos = jnp.sum(p * t, axis=1, keepdims=True)
    n = jnp.sum(t, axis=1, keepdims=True)
    return p, t, pos, n


def _fwd_kernel(x_ref, bits_ref, out_ref, *, C, temp):
    _, _, pos, n = _softmax_pos(x_ref[:], bits_ref[:], C, temp)
    nll = -jnp.log(pos + EPS)
    oh = n == 1.0
    mh = n > 1.0
    vals = (jnp.sum(jnp.where(oh, nll, 0.0)),
            jnp.sum(oh.astype(jnp.float32)),
            jnp.sum(jnp.where(mh, nll, 0.0)),
            jnp.sum(mh.astype(jnp.float32)))
    # output tile is (1, 8, 128); the four sums live in [0, 0, 0:4]
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
    row = jnp.zeros((1, 8, 128), jnp.float32)
    for i, v in enumerate(vals):
        row = row + jnp.where((sub == 0) & (lane == i), v, 0.0)
    out_ref[:] = row


def _bwd_kernel(g_ref, x_ref, bits_ref, dl_ref, *, C, temp):
    p, t, pos, n = _softmax_pos(x_ref[:], bits_ref[:], C, temp)
    scale = jnp.where(n == 1.0, g_ref[0],
                      jnp.where(n > 1.0, g_ref[1], 0.0))  # (ROWS, 1)
    # d(-log(pos+eps))/du_j = -(p_j t_j - pos p_j) / (T (pos+eps))
    coef = scale / (temp * (pos + EPS))
    dl_ref[:] = (coef * (pos * p - p * t)).astype(dl_ref.dtype)


def _pad_rows(x, bits, rows):
    N = x.shape[0]
    pad = (-N) % rows
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        bits = jnp.pad(bits, (0, pad))  # bits 0 -> neither bucket
    return x, bits, N


@functools.partial(jax.jit, static_argnames=("temp", "interpret"))
def _fwd_pallas(x, bits, temp, interpret=False):
    x, bits, N = _pad_rows(x, bits, ROWS)
    G = x.shape[0] // ROWS
    C = x.shape[1]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, C=C, temp=temp),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((ROWS, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, 8, 128), jnp.float32),
        interpret=interpret,
    )(x, bits.astype(jnp.int32)[:, None])
    s = jnp.sum(out, axis=(0, 1))
    return s[0], s[1], s[2], s[3]


@functools.partial(jax.jit, static_argnames=("temp", "interpret"))
def _bwd_pallas(x, bits, d_oh, d_mh, temp, interpret=False):
    orig_N, C = x.shape
    x, bits, N = _pad_rows(x, bits, ROWS)
    G = x.shape[0] // ROWS
    g = jnp.stack([d_oh, d_mh]).astype(jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((ROWS, C), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, C), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    dl = pl.pallas_call(
        functools.partial(_bwd_kernel, C=C, temp=temp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((x.shape[0], C), x.dtype),
        interpret=interpret,
    )(g, x, bits.astype(jnp.int32)[:, None])
    return dl[:orig_N]


def _dense_fwd(x, bits, temp):
    u = x.astype(jnp.float32) / temp
    p = jax.nn.softmax(u, axis=-1)
    lane = jnp.arange(x.shape[-1], dtype=jnp.int32)
    t = ((bits[:, None] >> lane) & 1).astype(jnp.float32)
    pos = jnp.sum(p * t, axis=-1)
    n = jnp.sum(t, axis=-1)
    nll = -jnp.log(pos + EPS)
    oh, mh = n == 1, n > 1
    return (jnp.sum(jnp.where(oh, nll, 0.0)), jnp.sum(oh.astype(jnp.float32)),
            jnp.sum(jnp.where(mh, nll, 0.0)), jnp.sum(mh.astype(jnp.float32)))


def _use_pallas():
    import os

    if os.environ.get("MULACTSEG_NO_PALLAS"):
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pixel_partial_ce(logits2d, bits, temp):
    """logits2d (N, C) any float dtype; bits (N,) int32 candidate
    bitmask (0 = invalid pixel). Returns four f32 scalars:
    (oh_nll_sum, oh_count, mh_nll_sum, mh_count)."""
    if _use_pallas():
        return _fwd_pallas(logits2d, bits, temp)
    return _dense_fwd(logits2d, bits, temp)


def _ppc_fwd(logits2d, bits, temp):
    return pixel_partial_ce(logits2d, bits, temp), (logits2d, bits)


def _ppc_bwd(temp, res, cts):
    d_oh_sum, _, d_mh_sum, _ = cts  # counts carry no logits gradient
    logits2d, bits = res
    if _use_pallas():
        dl = _bwd_pallas(logits2d, bits, d_oh_sum, d_mh_sum, temp)
    else:
        u = logits2d.astype(jnp.float32) / temp
        p = jax.nn.softmax(u, axis=-1)
        lane = jnp.arange(logits2d.shape[-1], dtype=jnp.int32)
        t = ((bits[:, None] >> lane) & 1).astype(jnp.float32)
        pos = jnp.sum(p * t, axis=-1)
        n = jnp.sum(t, axis=-1)
        scale = jnp.where(n == 1, d_oh_sum, jnp.where(n > 1, d_mh_sum, 0.0))
        coef = (scale / (temp * (pos + EPS)))[:, None]
        dl = coef * (pos[:, None] * p - p * t)
    return dl.astype(logits2d.dtype), None


pixel_partial_ce.defvjp(_ppc_fwd, _ppc_bwd)


# ---------------------------------------------------------------------------
# Channels-on-sublanes variant: consumes logits as (B, C, H*W).
#
# XLA lays the classifier logits out NCHW on TPU (minor dim = W, C on a
# major axis — verified in the optimized HLO: f32[4,768,768,20]{2,1,3,0}),
# so the row-major (N, C) view the kernel above wants costs a ~190 MB
# relayout copy PLUS 6.4x lane padding (20 -> 128) on every kernel read.
# This variant blocks over (image, pixel-chunk) with the C classes on
# sublanes: the (B, C, HW) view of NCHW logits is a free bitcast, blocks
# are (1, C, CHUNK) with the huge pixel dim on lanes — no padding, no
# relayout, same f32 in-register math.
# ---------------------------------------------------------------------------

CHUNK = 2048  # pixels per grid cell (lane dim); HW must divide


def _softmax_pos_cs(x, bits, temp):
    """x (C, CHUNK) logits block; bits (1, CHUNK) int32. All class-axis
    reductions run across sublanes."""
    u = x.astype(jnp.float32) / temp
    m = jnp.max(u, axis=0, keepdims=True)
    e = jnp.exp(u - m)
    z = jnp.sum(e, axis=0, keepdims=True)
    p = e / z
    cls = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
    t = ((bits >> cls) & 1).astype(jnp.float32)
    pos = jnp.sum(p * t, axis=0, keepdims=True)
    n = jnp.sum(t, axis=0, keepdims=True)
    return p, t, pos, n


def _fwd_kernel_cs(x_ref, bits_ref, out_ref, *, temp):
    _, _, pos, n = _softmax_pos_cs(x_ref[0], bits_ref[0], temp)
    nll = -jnp.log(pos + EPS)
    oh = n == 1.0
    mh = n > 1.0
    vals = (jnp.sum(jnp.where(oh, nll, 0.0)),
            jnp.sum(oh.astype(jnp.float32)),
            jnp.sum(jnp.where(mh, nll, 0.0)),
            jnp.sum(mh.astype(jnp.float32)))
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
    row = jnp.zeros((1, 8, 128), jnp.float32)
    for i, v in enumerate(vals):
        row = row + jnp.where((sub == 0) & (lane == i), v, 0.0)
    out_ref[0] = row


def _bwd_kernel_cs(g_ref, x_ref, bits_ref, dl_ref, *, temp):
    p, t, pos, n = _softmax_pos_cs(x_ref[0], bits_ref[0], temp)
    scale = jnp.where(n == 1.0, g_ref[0], jnp.where(n > 1.0, g_ref[1], 0.0))
    coef = scale / (temp * (pos + EPS))
    dl_ref[0] = (coef * (pos * p - p * t)).astype(dl_ref.dtype)


@functools.partial(jax.jit, static_argnames=("temp", "interpret"))
def _fwd_pallas_cs(xc, bits3, temp, interpret=False):
    B, C, HW = xc.shape
    G = HW // CHUNK
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_cs, temp=temp),
        grid=(B, G),
        in_specs=[
            pl.BlockSpec((1, C, CHUNK), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CHUNK), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, 128), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, G, 8, 128), jnp.float32),
        interpret=interpret,
    )(xc, bits3)
    s = jnp.sum(out, axis=(0, 1, 2))
    return s[0], s[1], s[2], s[3]


@functools.partial(jax.jit, static_argnames=("temp", "interpret"))
def _bwd_pallas_cs(xc, bits3, d_oh, d_mh, temp, interpret=False):
    B, C, HW = xc.shape
    G = HW // CHUNK
    g = jnp.stack([d_oh, d_mh]).astype(jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, G),
        in_specs=[
            pl.BlockSpec((1, C, CHUNK), lambda b, i, *_: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CHUNK), lambda b, i, *_: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, CHUNK), lambda b, i, *_: (b, 0, i),
                               memory_space=pltpu.VMEM),
    )
    dl = pl.pallas_call(
        functools.partial(_bwd_kernel_cs, temp=temp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C, HW), xc.dtype),
        interpret=interpret,
    )(g, xc, bits3)
    return dl


def _dense_fwd_cs(xc, bits3, temp):
    B, C, HW = xc.shape
    rows = jnp.swapaxes(xc, 1, 2).reshape(B * HW, C)
    return _dense_fwd(rows, bits3.reshape(B * HW), temp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pixel_partial_ce_nchw(logits_cs, bits3, temp):
    """Channels-on-sublanes pixel partial CE: logits_cs (B, C, H*W) — a
    free bitcast of the NCHW logits layout XLA already chose — bits3
    (B, 1, H*W) int32 candidate bitmasks. Same four f32 scalars as
    pixel_partial_ce. H*W must be a multiple of CHUNK (callers fall back
    to the row-major kernel otherwise)."""
    if _use_pallas():
        return _fwd_pallas_cs(logits_cs, bits3, temp)
    return _dense_fwd_cs(logits_cs, bits3, temp)


def _ppc_cs_fwd(logits_cs, bits3, temp):
    return pixel_partial_ce_nchw(logits_cs, bits3, temp), (logits_cs, bits3)


def _ppc_cs_bwd(temp, res, cts):
    d_oh_sum, _, d_mh_sum, _ = cts
    logits_cs, bits3 = res
    if _use_pallas():
        dl = _bwd_pallas_cs(logits_cs, bits3, d_oh_sum, d_mh_sum, temp)
    else:
        B, C, HW = logits_cs.shape
        rows = jnp.swapaxes(logits_cs, 1, 2).reshape(B * HW, C)
        u = rows.astype(jnp.float32) / temp
        p = jax.nn.softmax(u, axis=-1)
        lane = jnp.arange(C, dtype=jnp.int32)
        t = ((bits3.reshape(B * HW)[:, None] >> lane) & 1).astype(jnp.float32)
        pos = jnp.sum(p * t, axis=-1)
        n = jnp.sum(t, axis=-1)
        scale = jnp.where(n == 1, d_oh_sum, jnp.where(n > 1, d_mh_sum, 0.0))
        coef = (scale / (temp * (pos + EPS)))[:, None]
        dl = (coef * (pos[:, None] * p - p * t)).reshape(B, HW, C)
        dl = jnp.swapaxes(dl, 1, 2)
    return dl.astype(logits_cs.dtype), None


pixel_partial_ce_nchw.defvjp(_ppc_cs_fwd, _ppc_cs_bwd)
