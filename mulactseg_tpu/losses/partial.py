"""Partial-label losses over superpixel regions, vectorized for TPU.

Re-derivations of the reference losses (/root/reference/utils/loss.py and
trainer/active_joint_multi_predignore*.py) with identical mathematical
semantics but no per-image Python loops: every loss is one jitted dense
program over the whole batch. Normalizers match the reference exactly —
`num_valid` starts at 1 and accumulates globally across the batch
(/root/reference/utils/loss.py:106-107).

Conventions (differ deliberately from the torch reference):
  - logits are NHWC (B, H, W, C) — TPU-native layout;
  - `targets` are the per-superpixel multi-hot annotations (B, S, C_t)
    where C_t = num_classes + 1 (last channel = "undefined");
  - `slice_last=True` drops that channel (the non-predignore losses,
    utils/loss.py:124); `slice_last=False` keeps all channels (the
    predignore losses where the model itself predicts the undefined
    class, trainer/active_joint_multi_predignore.py:51);
  - invalid pixels are masked, never gathered — identical results.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mulactseg_tpu.ops.segment import segment_max_grad

EPS = 1e-8


def _flatten(logits, targets, spx, spmask, temp, slice_last):
    B, H, W, C = logits.shape
    probs = jax.nn.softmax(logits.astype(jnp.float32) / temp, axis=-1)
    probs = probs.reshape(B, H * W, C)
    spx = spx.reshape(B, H * W).astype(jnp.int32)
    mask = spmask.reshape(B, H * W).astype(bool)
    trg = targets[..., :-1] if slice_last else targets
    trg = trg.astype(jnp.float32)
    if trg.shape[-1] != C:
        raise ValueError(
            f"target channels {trg.shape[-1]} != logit channels {C} "
            f"(slice_last={slice_last})")
    return probs, trg, spx, mask


def _pixel_targets(trg, spx):
    """Gather each pixel's superpixel multi-hot: (B,S,C),(B,P) -> (B,P,C)."""
    return jnp.take_along_axis(trg, spx[:, :, None], axis=1)


def multi_choice_ce(logits, targets, spx, spmask, *, temp=1.0, slice_last=True):
    """Merged-positive CE (L_mp): -log sum_{c in candidates} p_c per pixel.

    slice_last=True  -> MultiChoiceCE   (utils/loss.py:535-588)
    slice_last=False -> MultiChoiceCE_  (trainer/active_joint_multi_predignore.py:17-73)
    """
    probs, trg, spx, mask = _flatten(logits, targets, spx, spmask, temp, slice_last)
    trg_pixel = _pixel_targets(trg, spx)
    valid = mask & jnp.any(trg_pixel > 0, axis=-1)
    pos = jnp.sum(probs * trg_pixel, axis=-1)
    nll = -jnp.log(pos + EPS)
    loss = jnp.sum(jnp.where(valid, nll, 0.0))
    num_valid = 1.0 + jnp.sum(valid)
    return loss / num_valid


def group_multi_label_ce(logits, targets, spx, spmask, *, nseg, temp=1.0,
                         slice_last=True, only_multi=False,
                         pixel_multi_mask=None):
    """MIL group loss (L_gm): per present (superpixel, candidate-class)
    pair, -log of the max predicted prob inside the superpixel.

    slice_last=True               -> GroupMultiLabelCE (utils/loss.py:81-141)
    slice_last=False              -> GroupMultiLabelCE_ (active_joint_multi_predignore.py:74-128)
    only_multi=True               -> GroupMultiLabelCE_onlymulti
                                     (active_joint_multi_predignore_mclossablation2.py:17-79):
                                     only pixels of multi-hot superpixels feed the max.

    An entry contributes iff its class is annotated AND the superpixel has
    at least one valid pixel (softmax>0 means present segments always have
    positive max — the reference's `nonzero()` filter reduces to this).
    """
    probs, trg, spx, mask = _flatten(logits, targets, spx, spmask, temp, slice_last)
    if only_multi:
        if pixel_multi_mask is not None:
            # caller already gathered per-pixel candidate counts (lossdecomp
            # shares the MC term's gather; saves a latency-bound bool gather)
            pix_multi = pixel_multi_mask.reshape(mask.shape)
        else:
            is_multi = jnp.sum(trg, axis=-1) > 1  # (B, S)
            pix_multi = jnp.take_along_axis(is_multi, spx, axis=1)
        mask = mask & pix_multi
    sid = jnp.where(mask, spx, nseg)

    def one(s, v):
        mx, argpix = segment_max_grad(v, s, nseg)
        # softmax probs are strictly positive, so a segment is present iff
        # its argmax is in range (== the reference's empty-row detection,
        # utils/loss.py:202-204)
        return mx, argpix[:, 0] < v.shape[0]

    mx, present = jax.vmap(one)(sid, probs)  # (B,S,C), (B,S)
    entry = (trg > 0.5) & present[:, :, None]
    nll = -jnp.log(mx + EPS)
    loss = jnp.sum(jnp.where(entry, nll, 0.0))
    num_valid = 1.0 + jnp.sum(entry)
    return loss / num_valid


def onehot_ce_multihot_choice(logits, targets, spx, spmask, *, temp=1.0,
                              return_multi_mask=False):
    """Loss decomposition of the merged-positive CE
    (trainer/active_joint_multi_predignore_lossdecomp.py:16-72): pixels in
    one-hot superpixels give a plain CE term, pixels in multi-hot
    superpixels give the merged-positive term; separate normalizers.
    Targets are used with all C+1 channels (predignore).

    Returns (oh_loss, mh_loss[, per-pixel multi-hot mask]).
    """
    probs, trg, spx, mask = _flatten(logits, targets, spx, spmask, temp,
                                     slice_last=False)
    trg_pixel = _pixel_targets(trg, spx)
    n_cand = jnp.sum(trg_pixel, axis=-1)
    pos = jnp.sum(probs * trg_pixel, axis=-1)
    nll = -jnp.log(pos + EPS)
    oh = mask & (n_cand == 1)
    mh = mask & (n_cand > 1)  # the reference asserts not-onehot == (>1)
    oh_loss = jnp.sum(jnp.where(oh, nll, 0.0)) / (1.0 + jnp.sum(oh))
    mh_loss = jnp.sum(jnp.where(mh, nll, 0.0)) / (1.0 + jnp.sum(mh))
    if return_multi_mask:
        return oh_loss, mh_loss, jax.lax.stop_gradient(n_cand > 1)
    return oh_loss, mh_loss


def lossdecomp(logits, targets, spx, spmask, *, nseg, coeff=16.0, coeff_mc=8.0,
               coeff_gm=1.0, ce_temp=0.1, multi_ce_temp=0.1, group_ce_temp=0.1):
    """The shipped stage-1 training loss (Cityscapes):
    coeff*CE(one-hot spx) + coeff_mc*MC(multi-hot spx) + coeff_gm*Group(multi-hot spx)
    (trainer/active_joint_multi_predignore_lossdecomp.py:102-104; coeffs/temps
    from script/open_source/train_city_mul_res50.sh).

    NOTE: ce_temp is accepted for config parity; the decomposed CE term uses
    multi_ce_temp, exactly as the reference's OnehotCEMultihotChoice does.

    (A single-softmax fused variant was measured SLOWER on TPU than this
    composed form — sharing the (B,P,C) probs forces XLA to materialize
    190MB instead of recomputing softmax inside each consumer's fusion —
    so the terms stay composed on purpose.)

    Returns (total, aux dict).
    """
    del ce_temp  # parity: reference passes multi_ce_temp to both CE and MC terms
    ce, mc, pix_multi = onehot_ce_multihot_choice(
        logits, targets, spx, spmask, temp=multi_ce_temp,
        return_multi_mask=True)
    group = group_multi_label_ce(logits, targets, spx, spmask, nseg=nseg,
                                 temp=group_ce_temp, slice_last=False,
                                 only_multi=True,
                                 pixel_multi_mask=pix_multi)
    total = coeff * ce + coeff_mc * mc + coeff_gm * group
    return total, {"ce_loss": ce, "mc_loss": mc, "group_loss": group,
                   "train_loss": total}


def multi_choice_ce_scale(logits, targets, spx, spmask, *, temp=1.0):
    """MultiChoiceCEScale (trainer/active_joint_multi_predignore_lscale.py):
    MC loss with each pixel's NLL scaled by log(C+1)/log(C+2-nhot) — the
    reference hardcodes the table log(20-k) for Cityscapes; we generate
    it from the channel count."""
    probs, trg, spx, mask = _flatten(logits, targets, spx, spmask, temp,
                                     slice_last=False)
    C = probs.shape[-1]
    ks = jnp.arange(C, dtype=jnp.float32)
    table = jnp.log(jnp.float32(C)) / jnp.log(jnp.maximum(C - ks, 2.0))
    # table[nhot-1]; entry for nhot-1 == C-1 is log(C)/log(2) like the ref
    trg_pixel = _pixel_targets(trg, spx)
    valid = mask & jnp.any(trg_pixel > 0, axis=-1)
    pos = jnp.sum(probs * trg_pixel, axis=-1)
    nhot = jnp.sum(trg_pixel, axis=-1).astype(jnp.int32)
    w = jnp.take(table, jnp.clip(nhot - 1, 0, C - 1))
    nll = -w * jnp.log(pos + EPS)
    loss = jnp.sum(jnp.where(valid, nll, 0.0))
    return loss / (1.0 + jnp.sum(valid))


def multi_choice_ce_only_dominant(logits, targets, spx, spmask, *, temp=1.0):
    """MultiChoiceCE_onlyDom (active_joint_multi_predignore_mclossablation
    .py:20-80): MC loss restricted to pixels of one-hot (dominant)
    superpixels."""
    probs, trg, spx, mask = _flatten(logits, targets, spx, spmask, temp,
                                     slice_last=False)
    trg_pixel = _pixel_targets(trg, spx)
    n_cand = jnp.sum(trg_pixel, axis=-1)
    valid = mask & (n_cand == 1)
    pos = jnp.sum(probs * trg_pixel, axis=-1)
    nll = -jnp.log(pos + EPS)
    loss = jnp.sum(jnp.where(valid, nll, 0.0))
    return loss / (1.0 + jnp.sum(valid))


def weighted_group_multi_label_ce(logits, plbl_logits, targets, spx, spmask,
                                  *, nseg, temp=1.0, only_single=False):
    """WeightedGroupMultiLabelCE (active_joint_multi_predignore_wgroup
    .py:12-83): group entries weighted by the detached segment-max of an
    eval-mode prediction's softmax."""
    probs, trg, spx, mask = _flatten(logits, targets, spx, spmask, temp,
                                     slice_last=False)
    plbl_probs, _, _, _ = _flatten(plbl_logits, targets, spx, spmask, temp,
                                   slice_last=False)
    row_ok = (jnp.sum(trg, axis=-1) > 1) if only_single else \
        jnp.any(trg > 0, axis=-1)
    sid = jnp.where(mask, spx, nseg)

    def one(s, v, w):
        mx, argpix = segment_max_grad(v, s, nseg)
        wmx, _ = segment_max_grad(jax.lax.stop_gradient(w), s, nseg)
        return mx, wmx, argpix[:, 0] < v.shape[0]

    mx, wmx, present = jax.vmap(one)(sid, probs, plbl_probs)
    entry = (trg > 0.5) & present[:, :, None] & row_ok[:, :, None]
    nll = -jax.lax.stop_gradient(wmx) * jnp.log(mx + EPS)
    loss = jnp.sum(jnp.where(entry, nll, 0.0))
    return loss / (1.0 + jnp.sum(entry))


def top_one_plbl_loss(logits, plbl_logits, targets, spx, spmask, *,
                      temp=1.0, within_filtering=False, threshold=0.0):
    """TopOnePlbl (trainer/active_joint_multi_predignore_top1plbl.py:13-82):
    on multi-candidate pixels whose eval-view top-1 candidate confidence
    (optionally renormalized within candidates) passes the threshold,
    -log of the train view's top candidate probability."""
    probs, trg, spx, mask = _flatten(logits, targets, spx, spmask, temp,
                                     slice_last=False)
    plbl_probs, _, _, _ = _flatten(jax.lax.stop_gradient(plbl_logits),
                                   targets, spx, spmask, temp,
                                   slice_last=False)
    trg_pixel = _pixel_targets(trg, spx)
    multi = mask & (jnp.sum(trg_pixel, axis=-1) > 1)
    pos = probs * trg_pixel
    pos_plbl = plbl_probs * trg_pixel
    if within_filtering:
        pos_plbl = pos_plbl / jnp.maximum(
            jnp.sum(pos_plbl, axis=-1, keepdims=True), EPS)
    conf = jnp.max(pos_plbl, axis=-1)
    keep = multi & (conf > threshold)
    top = jnp.max(pos, axis=-1)
    loss = jnp.sum(jnp.where(keep, -jnp.log(top + EPS), 0.0))
    return loss / (1.0 + jnp.sum(keep))


def exclusive_ce(logits, targets, spx, spmask):
    """ExclusiveCE ablation
    (trainer/active_joint_multi_predignore_exclusivece.py:20-78): for each
    candidate class, a softmax whose denominator excludes the *other*
    candidates; per-pixel mean over candidates. Raw logits (the reference
    applies no temperature here)."""
    B, H, W, C = logits.shape
    lg = logits.astype(jnp.float32).reshape(B, H * W, C)
    spxf = spx.reshape(B, H * W).astype(jnp.int32)
    mask = spmask.reshape(B, H * W).astype(bool)
    trg_pixel = _pixel_targets(targets.astype(jnp.float32), spxf)
    valid = mask & jnp.any(trg_pixel > 0, axis=-1)
    e = jnp.exp(lg)
    neg_sum = jnp.sum(e * (1.0 - trg_pixel), axis=-1, keepdims=True)
    denom = (neg_sum + e) * trg_pixel
    es = (e * trg_pixel) / (denom + EPS)
    ce = -jnp.log(es + EPS) * trg_pixel
    pix = jnp.sum(ce, axis=-1) / jnp.maximum(jnp.sum(trg_pixel, axis=-1), 1.0)
    loss = jnp.sum(jnp.where(valid, pix, 0.0))
    return loss / (1.0 + jnp.sum(valid))


def onehot_ce_multihot_topone(logits, targets, spx, spmask, *, temp=1.0):
    """Lossdecomp with naive top-1 selection on multi-hot pixels
    (trainer/active_joint_multi_lossdecomp_topone.py:14-70): the multi-hot
    term uses -log(max candidate prob) instead of the merged sum."""
    probs, trg, spx, mask = _flatten(logits, targets, spx, spmask, temp,
                                     slice_last=False)
    trg_pixel = _pixel_targets(trg, spx)
    n_cand = jnp.sum(trg_pixel, axis=-1)
    pos_sum = jnp.sum(probs * trg_pixel, axis=-1)
    pos_max = jnp.max(probs * trg_pixel, axis=-1)
    oh = mask & (n_cand == 1)
    mh = mask & (n_cand > 1)
    oh_loss = jnp.sum(jnp.where(oh, -jnp.log(pos_sum + EPS), 0.0)) / (
        1.0 + jnp.sum(oh))
    mh_loss = jnp.sum(jnp.where(mh, -jnp.log(pos_max + EPS), 0.0)) / (
        1.0 + jnp.sum(mh))
    return oh_loss, mh_loss


def onehot_ce_multihot_rc(logits, targets, spx, spmask, *, temp=1.0):
    """Lossdecomp with risk-consistent weighting on multi-hot pixels
    (trainer/active_joint_multi_lossdecomp_rc.py): per-class NLLs weighted
    by self-normalized detached candidate predictions."""
    probs, trg, spx, mask = _flatten(logits, targets, spx, spmask, temp,
                                     slice_last=False)
    trg_pixel = _pixel_targets(trg, spx)
    n_cand = jnp.sum(trg_pixel, axis=-1)
    pos = probs * trg_pixel
    pos_sum = jnp.sum(pos, axis=-1)
    oh = mask & (n_cand == 1)
    mh = mask & (n_cand > 1)
    oh_loss = jnp.sum(jnp.where(oh, -jnp.log(pos_sum + EPS), 0.0)) / (
        1.0 + jnp.sum(oh))
    w = jax.lax.stop_gradient(pos)
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), EPS)
    per = jnp.sum(w * -jnp.log(pos + EPS), axis=-1)
    mh_loss = jnp.sum(jnp.where(mh, per, 0.0)) / (1.0 + jnp.sum(mh))
    return oh_loss, mh_loss


def rc_multi_choice_ce(logits, targets, spx, spmask, *, temp=1.0,
                       slice_last=True):
    """Risk-consistent weighted candidate CE (utils/loss.py:653-707):
    self-normalized detached weights over candidate predictions."""
    probs, trg, spx, mask = _flatten(logits, targets, spx, spmask, temp, slice_last)
    trg_pixel = _pixel_targets(trg, spx)
    valid = mask & jnp.any(trg_pixel > 0, axis=-1)
    pos = probs * trg_pixel  # (B,P,C)
    w = jax.lax.stop_gradient(pos)
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), EPS)
    perpix = jnp.sum(w * -jnp.log(pos + EPS), axis=-1)
    loss = jnp.sum(jnp.where(valid, perpix, 0.0))
    return loss / (1.0 + jnp.sum(valid))


def multi_choice_ent(logits, targets, spx, spmask, *, temp=1.0, slice_last=True):
    """Entropy within the candidate set for multi-hot pixels
    (utils/loss.py:590-651, implementing its intended semantics — the
    reference file has a dead-name bug on its valid_input path)."""
    B, H, W, C = logits.shape
    lg = logits.astype(jnp.float32).reshape(B, H * W, C)
    spx = spx.reshape(B, H * W).astype(jnp.int32)
    mask = spmask.reshape(B, H * W).astype(bool)
    trg = targets[..., :-1] if slice_last else targets
    trg_pixel = _pixel_targets(trg.astype(jnp.float32), spx)
    valid = mask & (jnp.sum(trg_pixel, axis=-1) > 1)
    masked_logits = jnp.where(trg_pixel > 0, lg, -jnp.inf)
    p = jax.nn.softmax(masked_logits / temp, axis=-1)
    p = jnp.where(trg_pixel > 0, p, 0.0)
    ent = -jnp.sum(p * jnp.log(p + EPS), axis=-1)
    loss = jnp.sum(jnp.where(valid, ent, 0.0))
    return loss / (1.0 + jnp.sum(valid))


def max_multi_choice_ce(logits, targets, spx, spmask, *, temp=1.0,
                        slice_last=True):
    """CE on the single most-confident candidate class per pixel.

    Reconstruction of MaxMultiChoiceCE, which active_joint_multi_ablation.py:7
    imports but utils/loss.py never defines (the reference file is
    unimportable for --loss_type max_multi_ce). Natural semantics matching
    the MultiChoiceCE frame: loss = -log max_{c in candidates} p_c.
    """
    probs, trg, spx, mask = _flatten(logits, targets, spx, spmask, temp,
                                     slice_last)
    trg_pixel = _pixel_targets(trg, spx)
    valid = mask & jnp.any(trg_pixel > 0, axis=-1)
    pos = jnp.max(jnp.where(trg_pixel > 0, probs, 0.0), axis=-1)
    loss = jnp.sum(jnp.where(valid, -jnp.log(pos + EPS), 0.0))
    return loss / (1.0 + jnp.sum(valid))


def rand_multi_choice_ce(logits, targets, spx, spmask, rng, *, temp=1.0,
                         slice_last=True):
    """CE on one uniformly-sampled candidate class per pixel.

    Reconstruction of RandMultiChoiceCE (same unimportable-import situation
    as max_multi_choice_ce above): sample c ~ U(candidates), loss = -log p_c.
    Implemented via Gumbel-max over the candidate mask so the sampling stays
    inside the jitted program.
    """
    probs, trg, spx, mask = _flatten(logits, targets, spx, spmask, temp,
                                     slice_last)
    trg_pixel = _pixel_targets(trg, spx)
    valid = mask & jnp.any(trg_pixel > 0, axis=-1)
    g = jax.random.gumbel(rng, trg_pixel.shape, jnp.float32)
    pick = jnp.argmax(jnp.where(trg_pixel > 0, g, -jnp.inf), axis=-1)
    pos = jnp.take_along_axis(probs, pick[..., None], axis=-1)[..., 0]
    loss = jnp.sum(jnp.where(valid, -jnp.log(pos + EPS), 0.0))
    return loss / (1.0 + jnp.sum(valid))


def plbl_onehot_ce_multihot_choice(logits, targets, spx, spmask, plbl, *,
                                   temp=1.0, ignore_idx=255):
    """Sequence-training positive term (PlblOnehotCEMultihotChoice).

    The reference's sequence trainer
    (active_joint_multi_predignore_sequence.py:9) imports this criterion
    from trainer/active_joint_multi_predignore_lossdecomp_sequence.py, a
    file absent from the repo — the trainer is unimportable upstream. This
    reconstruction follows its call site exactly (sequence.py:44-49): it
    must return (ce_loss_sum, ce_loss_num, mc_loss_sum, mc_loss_num) so the
    caller can pool the normalizers, with the previous round's pseudo label
    map (`plbl`, 255 = unknown) disambiguating multi-hot pixels:
      - one-hot-superpixel pixels -> plain CE on the candidate class;
      - multi-hot pixels whose plbl is one of the candidates -> CE on the
        plbl class (counted into the CE bucket);
      - remaining multi-hot pixels -> merged-positive MC.
    """
    probs, trg, spx_f, mask = _flatten(logits, targets, spx, spmask, temp,
                                       slice_last=False)
    B, P, C = probs.shape
    trg_pixel = _pixel_targets(trg, spx_f)
    n_cand = jnp.sum(trg_pixel, axis=-1)
    plbl = plbl.reshape(B, P).astype(jnp.int32)
    plbl_safe = jnp.clip(plbl, 0, C - 1)
    plbl_onehot = jax.nn.one_hot(plbl_safe, C, dtype=jnp.float32)
    plbl_in_cand = (plbl != ignore_idx) & (
        jnp.sum(trg_pixel * plbl_onehot, axis=-1) > 0)

    pos_merged = jnp.sum(probs * trg_pixel, axis=-1)
    pos_plbl = jnp.take_along_axis(probs, plbl_safe[..., None],
                                   axis=-1)[..., 0]

    oh = mask & (n_cand == 1)
    mh_plbl = mask & (n_cand > 1) & plbl_in_cand
    mh = mask & (n_cand > 1) & ~plbl_in_cand

    ce_sum = (jnp.sum(jnp.where(oh, -jnp.log(pos_merged + EPS), 0.0)) +
              jnp.sum(jnp.where(mh_plbl, -jnp.log(pos_plbl + EPS), 0.0)))
    ce_num = jnp.sum(oh) + jnp.sum(mh_plbl)
    mc_sum = jnp.sum(jnp.where(mh, -jnp.log(pos_merged + EPS), 0.0))
    mc_num = jnp.sum(mh)
    return ce_sum, ce_num, mc_sum, mc_num
