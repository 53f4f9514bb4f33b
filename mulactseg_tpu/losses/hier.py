"""Hierarchy (two-scale superpixel) group losses.

The hier family selects, for every (big-superpixel, annotated-class)
pair, the argmax pixel under the big superpixel and then spreads the
class's NLL over the *small* superpixel containing that pixel
(utils/loss.py:143-235); async variants select on a weak view and apply
on a strong view (:341-437), the weighted variant scales by the weak
view's per-(small-spx, class) confidence (:237-339), and the aug variant
removes labels of superpixels touching the crop border (:439-533).

Vectorized: one big-spx segment argmax + one small-spx segment NLL-sum
per image; pair extraction is a dense (S, C) mask instead of nonzero().
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mulactseg_tpu.ops.segment import (
    seg_context,
    seg_count,
    seg_sum,
    segment_max_grad,
)

EPS = 1e-8


def _prep(logits, temp):
    B, H, W, C = logits.shape
    probs = jax.nn.softmax(logits.astype(jnp.float32) / temp, axis=-1)
    return probs.reshape(B, H * W, C), B, H * W, C


def _pairs_from_argmax(probs_or_logits, sid_big, nseg, trg, only_single,
                       gumbel_rng=None, gumbel_scale=-1.0, probs=None):
    """Returns (pair_mask (S,C), argmax pixel (S,C))."""
    sel_vals = probs_or_logits
    if gumbel_scale != -1.0 and gumbel_rng is not None:
        g = jax.random.gumbel(gumbel_rng, sel_vals.shape) * gumbel_scale
        sel_vals = sel_vals + g
    _, argpix = segment_max_grad(sel_vals, sid_big, nseg)
    present = argpix[:, 0] < sel_vals.shape[0]
    pair = (trg > 0.5) & present[:, None]
    if only_single:
        pair = pair & (jnp.sum(trg, axis=-1) > 1)[:, None]
    return pair, argpix


def hier_group_multi_label_ce(logits, targets, spx, spx_small, spmask, *,
                              nseg, small_nseg, temp=1.0, only_single=False,
                              gumbel_scale=-1.0,
                              gumbel_rng: Optional[jax.Array] = None):
    """HierGroupMultiLabelCE (utils/loss.py:143-235). Targets use channels
    [:-1] like the reference (:200)."""
    probs, B, P, C = _prep(logits, temp)
    trg = targets[..., :-1].astype(jnp.float32)
    spxf = spx.reshape(B, P).astype(jnp.int32)
    smallf = spx_small.reshape(B, P).astype(jnp.int32)
    mask = spmask.reshape(B, P).astype(bool)
    use_gumbel = gumbel_scale != -1.0 and gumbel_rng is not None
    logits_flat = logits.astype(jnp.float32).reshape(B, P, C) if use_gumbel \
        else None
    rngs = jax.random.split(gumbel_rng, B) if use_gumbel else jnp.zeros((B, 2),
                                                                        jnp.uint32)

    def one(pr, lf, sb, ss, m, t, rng):
        sid_big = jnp.where(m, sb, nseg)
        sid_small = jnp.where(m, ss, small_nseg)
        sel = lf if use_gumbel else pr
        pair, argpix = _pairs_from_argmax(
            sel, sid_big, nseg, t, only_single,
            gumbel_rng=rng if use_gumbel else None,
            gumbel_scale=gumbel_scale)
        small_at = jnp.take(jnp.concatenate([ss, jnp.full((1,), small_nseg,
                                                          jnp.int32)]),
                            jnp.clip(argpix, 0, P), axis=0)  # (S, C)
        ctx = seg_context(sid_small, small_nseg)
        nll_sums = seg_sum(ctx, -jnp.log(pr + EPS))       # (S_small, C)
        sizes = seg_count(ctx)                            # (S_small,)
        small_c = jnp.clip(small_at, 0, small_nseg - 1)
        rows = jnp.take(nll_sums, small_c.reshape(-1), axis=0).reshape(
            small_at.shape + (nll_sums.shape[-1],))
        val = jnp.diagonal(rows, axis1=1, axis2=2)  # val[s,c]=sums[at[s,c],c]
        size = jnp.take(sizes, small_c.reshape(-1)).reshape(small_at.shape)
        ok = pair & (small_at < small_nseg)
        loss = jnp.sum(jnp.where(ok, val, 0.0))
        num = jnp.sum(jnp.where(ok, size, 0))
        return loss, num

    losses, nums = jax.vmap(one)(probs, logits_flat if use_gumbel else probs,
                                 spxf, smallf, mask, trg, rngs)
    return jnp.sum(losses) / (1.0 + jnp.sum(nums))


def async_hier_group_multi_label_ce(
        logits_strong, logits_weak, targets, spx_weak, spx_small_strong,
        spx_small_weak, spmask_strong, spmask_weak, *, nseg, small_nseg,
        temp=1.0, weight_reduce: Optional[str] = None):
    """Async(Weight)HierGroupMultiLabelCE (utils/loss.py:341-437 /
    :237-339): (small-spx, class) pairs picked on the weak view's big-spx
    argmax, loss applied to the strong view's small-spx NLL sums. Sizes
    of small spxs absent in the strong view are dropped from the
    normalizer (the reference's value.nonzero() filter, :326-331).
    weight_reduce in (None, 'max', 'mean')."""
    probs_s, B, P_s, C = _prep(logits_strong, temp)
    probs_w, _, P_w, _ = _prep(logits_weak, temp)
    trg = targets[..., :-1].astype(jnp.float32)
    spx_w = spx_weak.reshape(B, P_w).astype(jnp.int32)
    small_s = spx_small_strong.reshape(B, P_s).astype(jnp.int32)
    small_w = spx_small_weak.reshape(B, P_w).astype(jnp.int32)
    mask_s = spmask_strong.reshape(B, P_s).astype(bool)
    mask_w = spmask_weak.reshape(B, P_w).astype(bool)

    def one(ps, pw, sw, sss, ssw, ms, mw, t):
        sid_big_w = jnp.where(mw, sw, nseg)
        pair, argpix_w = _pairs_from_argmax(pw, sid_big_w, nseg, t, False)
        small_at = jnp.take(
            jnp.concatenate([ssw, jnp.full((1,), small_nseg, jnp.int32)]),
            jnp.clip(argpix_w, 0, P_w), axis=0)  # (S, C)

        sid_small_s = jnp.where(ms, sss, small_nseg)
        ctx_s = seg_context(sid_small_s, small_nseg)
        nll_sums = seg_sum(ctx_s, -jnp.log(ps + EPS))  # (S_small, C)
        sizes = seg_count(ctx_s)

        small_c = jnp.clip(small_at, 0, small_nseg - 1)
        rows = jnp.take(nll_sums, small_c.reshape(-1), axis=0).reshape(
            small_at.shape + (C,))
        val = jnp.diagonal(rows, axis1=1, axis2=2)
        size = jnp.take(sizes, small_c.reshape(-1)).reshape(small_at.shape)

        if weight_reduce is not None:
            sid_small_w = jnp.where(mw, ssw, small_nseg)
            if weight_reduce == "max":
                red, _ = segment_max_grad(pw, sid_small_w, small_nseg)
            else:
                from mulactseg_tpu.ops.segment import seg_mean
                ctx_w = seg_context(sid_small_w, small_nseg)
                red = seg_mean(ctx_w, pw)
            wrow = jnp.take(red, small_c.reshape(-1), axis=0).reshape(
                small_at.shape + (C,))
            w = jnp.diagonal(wrow, axis1=1, axis2=2)
            val = val * jax.lax.stop_gradient(w)

        ok = pair & (small_at < small_nseg) & (val != 0)
        loss = jnp.sum(jnp.where(pair & (small_at < small_nseg), val, 0.0))
        num = jnp.sum(jnp.where(ok, size, 0))
        return loss, num

    losses, nums = jax.vmap(one)(probs_s, probs_w, spx_w, small_s, small_w,
                                 mask_s, mask_w, trg)
    return jnp.sum(losses) / (1.0 + jnp.sum(nums))


def border_spx_ids_mask(spx_2d, nseg):
    """(S,) bool — superpixels touching the crop border
    (utils/loss.py:462-498's boundary_values)."""
    border = jnp.concatenate([spx_2d[0], spx_2d[-1], spx_2d[:, 0],
                              spx_2d[:, -1]])
    return jnp.any(border[None, :] == jnp.arange(nseg)[:, None], axis=1)


def aug_hier_group_multi_label_ce(logits, targets, spx, spx_small, spmask, *,
                                  nseg, small_nseg, temp=1.0,
                                  only_single=False, gumbel_scale=-1.0):
    """AugHierGroupMultiLabelCE (utils/loss.py:439-533): hier loss with
    border-superpixel labels removed per image."""
    B = logits.shape[0]

    def strip(t, s2d):
        border = border_spx_ids_mask(s2d, nseg)
        return jnp.where(border[:, None], 0.0, t[..., :-1])

    trg = jax.vmap(strip)(targets.astype(jnp.float32), spx)
    # re-attach a dummy last channel so hier_group slices it back off
    trg_full = jnp.concatenate([trg, jnp.zeros(trg.shape[:-1] + (1,))], -1)
    return hier_group_multi_label_ce(
        logits, trg_full, spx, spx_small, spmask, nseg=nseg,
        small_nseg=small_nseg, temp=temp, only_single=only_single,
        gumbel_scale=gumbel_scale)
