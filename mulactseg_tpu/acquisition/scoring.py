"""Jitted acquisition scoring kernels.

One fused XLA program per pool batch replaces the reference's
softmax -> topk -> scatter chains (/root/reference/active_selection/
my_bvsb.py:19-27,59-74 and my_bvsb_predclsbal_pwr_banignore.py:34-72):
BvSB per pixel, optional pixel-wise class-balance weighting, region mean
via the segment engine, and per-region top-1 class votes — returning one
(B, nseg) array (plus votes) per sweep. Min-max normalization and the
ignore-ban run on-device over the full (N, nseg) score tensor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mulactseg_tpu.ops.segment import seg_context, seg_count, seg_mean, seg_sum


def bvsb_top1(logits, temp):
    """(B,H,W,C) -> bvsb (B,H,W), top1 (B,H,W).
    bvsb = p2/p1 + 1e-8 (my_bvsb.py:19-27)."""
    prob = jax.nn.softmax(logits.astype(jnp.float32) / temp, axis=-1)
    top2, idx2 = jax.lax.top_k(prob, 2)
    bvsb = top2[..., 1] / top2[..., 0] + 1e-8
    return bvsb, idx2[..., 0]


@functools.partial(jax.jit, static_argnames=("nseg", "drop_last"))
def region_bvsb_scores(logits, spx, *, nseg: int, temp: float,
                       drop_last: bool = False):
    """Plain BvSB region scores: per-superpixel mean of pixel BvSB
    (my_bvsb.py:50-74). drop_last slices off the undefined channel when the
    model is predignore (my_bvsb.py:65-66). Returns (B, nseg)."""
    if drop_last:
        logits = logits[..., :-1]
    bvsb, _ = bvsb_top1(logits, temp)
    B = logits.shape[0]
    flat_b = bvsb.reshape(B, -1)
    flat_s = spx.reshape(B, -1).astype(jnp.int32)

    def one(s, v):
        ctx = seg_context(s, nseg)
        return seg_mean(ctx, v)

    return jax.vmap(one)(flat_s, flat_b)


@functools.partial(jax.jit, static_argnames=())
def mean_softmax(logits, temp):
    """Pass 1 of the paper selector: batch-mean softmax over all pixels
    (my_bvsb_predclsbal_pwr_banignore.py:41-42). Returns (C,) summed over
    the batch mean — caller accumulates and divides by n_batches."""
    prob = jax.nn.softmax(logits.astype(jnp.float32) / temp, axis=-1)
    return jnp.mean(prob, axis=(0, 1, 2))


def cls_weight_pwr(cumulated_prob, coeff):
    """(k*p_hat + 1)^-2 (my_bvsb_predclsbal_pwr_banignore.py:47)."""
    return (coeff * cumulated_prob + 1.0) ** -2


@functools.partial(jax.jit, static_argnames=("nseg",))
def region_weighted_bvsb_and_votes(logits, spx, cls_weight, *, nseg: int,
                                   temp: float = 1.0):
    """Pass 2: pixel BvSB over all C+1 channels at the selector's
    temperature (softmax_bvsb with self.temperature == ce_temp,
    my_bvsb_predclsbal_pwr_banignore.py:57 via my_bvsb.py:19-27) weighted
    by the top-1 class's weight, region-mean'd; plus per-region one-hot
    top-1 vote counts. Returns (B, nseg) scores and (B, nseg, C) votes."""
    C = logits.shape[-1]
    bvsb, top1 = bvsb_top1(logits, temp)
    w = cls_weight[top1]
    weighted = bvsb * w
    B = logits.shape[0]
    flat_w = weighted.reshape(B, -1)
    flat_s = spx.reshape(B, -1).astype(jnp.int32)
    flat_t = top1.reshape(B, -1)

    def one(s, v, t):
        ctx = seg_context(s, nseg)
        mean = seg_mean(ctx, v)
        votes = seg_sum(ctx, jax.nn.one_hot(t, C, dtype=jnp.int32))
        return mean, votes

    return jax.vmap(one)(flat_s, flat_w, flat_t)


def minmax_normalize(scores):
    """Normalize over the whole (N*nseg,) tensor excluding exact zeros
    (absent regions), reproducing my_bvsb.py:78-82: valid scores map to
    [0,1]; absent regions go negative."""
    flat = scores.reshape(-1)
    nonzero = flat != 0
    big = jnp.where(nonzero, flat, jnp.inf)
    mn = jnp.min(big)
    shifted = flat - mn
    mx = jnp.max(shifted)
    return (shifted / jnp.where(mx == 0, 1.0, mx)).reshape(scores.shape)


def ban_ignore_dominant(scores, votes):
    """Zero the score of regions whose top-1-vote class is the undefined
    channel (my_bvsb_predclsbal_pwr_banignore.py:81-84)."""
    dom = jnp.argmax(votes, axis=-1)
    is_ignore = dom == (votes.shape[-1] - 1)
    return jnp.where(is_ignore, 0.0, scores)
