"""Loss parity tests: brute-force numpy re-implementations of the reference's
per-image loops (utils/loss.py, trainer/active_joint_multi_predignore*.py)
vs the vectorized TPU losses."""

import numpy as np
import jax.numpy as jnp
import pytest

from mulactseg_tpu.losses import (
    multi_choice_ce,
    group_multi_label_ce,
    onehot_ce_multihot_choice,
    lossdecomp,
    rc_multi_choice_ce,
    cross_entropy,
    focal_loss,
    rcce,
)

EPS = 1e-8


def _softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def make_case(seed=0, B=3, H=8, W=9, C=6, S=13, predignore=False):
    """Random logits + region annotations. When predignore, model channels
    == target channels == C (incl. undefined); otherwise model has C-1."""
    rng = np.random.RandomState(seed)
    Cm = C if predignore else C - 1
    logits = rng.randn(B, H, W, Cm).astype(np.float32) * 2
    spx = rng.randint(0, S, size=(B, H, W)).astype(np.int32)
    # multi-hot targets: each superpixel gets 0-3 classes
    targets = np.zeros((B, S, C), np.float32)
    for b in range(B):
        for s in range(S):
            k = rng.randint(0, 4)
            cls = rng.choice(C, size=k, replace=False)
            targets[b, s, cls] = 1
    # select ~60% of superpixels; image 2 gets nothing selected (edge case)
    sel = rng.rand(B, S) < 0.6
    sel[2] = False
    spmask = np.zeros((B, H, W), bool)
    for b in range(B):
        spmask[b] = sel[b][spx[b]]
    return logits, targets, spx, spmask


# ---- brute-force references (direct transcription of the torch loops) ----

def ref_multi_choice_ce(logits, targets, spx, spmask, temp, slice_last):
    B, H, W, C = logits.shape
    probs = _softmax(logits.reshape(B, -1, C) / temp, axis=2)
    spx = spx.reshape(B, -1)
    mask = spmask.reshape(B, -1)
    trg = targets[..., :-1] if slice_last else targets
    loss, num_valid = 0.0, 1
    for i in range(B):
        if not mask[i].any():
            continue
        vo = probs[i][mask[i]]
        vs = spx[i][mask[i]]
        tp = trg[i][vs]
        keep = tp.any(1)
        vo, tp = vo[keep], tp[keep]
        pos = (vo * tp).sum(1)
        num_valid += pos.shape[0]
        loss += -np.log(pos + EPS).sum()
    return loss / num_valid


def ref_group_ce(logits, targets, spx, spmask, temp, S, slice_last, only_multi):
    B, H, W, C = logits.shape
    probs = _softmax(logits.reshape(B, -1, C) / temp, axis=2)
    spxf = spx.reshape(B, -1)
    maskf = spmask.reshape(B, -1)
    trg_all = targets[..., :-1] if slice_last else targets
    loss, num_valid = 0.0, 1
    for i in range(B):
        mask = maskf[i].copy()
        if not mask.any():
            continue
        if only_multi:
            is_multi = targets[i].sum(1) > 1
            mask = mask & is_multi[spxf[i]]
            if not mask.any():
                continue
        vo = probs[i][mask]
        vs = spxf[i][mask]
        mx = np.zeros((S, C))
        for p in range(vo.shape[0]):
            mx[vs[p]] = np.maximum(mx[vs[p]], vo[p])
        trg = trg_all[i]
        prod = mx * trg
        nz = prod[prod != 0]
        num_valid += nz.shape[0]
        loss += -np.log(nz + EPS).sum()
    return loss / num_valid


def ref_lossdecomp_mc(logits, targets, spx, spmask, temp):
    B, H, W, C = logits.shape
    probs = _softmax(logits.reshape(B, -1, C) / temp, axis=2)
    spx = spx.reshape(B, -1)
    mask = spmask.reshape(B, -1)
    ohl, ohn, mhl, mhn = 0.0, 1, 0.0, 1
    for i in range(B):
        if not mask[i].any():
            continue
        vo = probs[i][mask[i]]
        tp = targets[i][spx[i][mask[i]]]
        pos = (vo * tp).sum(1)
        onehot = tp.sum(1) == 1
        if onehot.any():
            ohl += -np.log(pos[onehot] + EPS).sum()
            ohn += onehot.sum()
        multi = tp.sum(1) > 1
        if multi.any():
            mhl += -np.log(pos[multi] + EPS).sum()
            mhn += multi.sum()
    return ohl / ohn, mhl / mhn


# ---------------------------- tests ----------------------------------------

@pytest.mark.parametrize("slice_last", [True, False])
def test_multi_choice_ce(slice_last):
    logits, targets, spx, spmask = make_case(predignore=not slice_last)
    want = ref_multi_choice_ce(logits, targets, spx, spmask, 0.1, slice_last)
    got = multi_choice_ce(jnp.asarray(logits), jnp.asarray(targets),
                          jnp.asarray(spx), jnp.asarray(spmask),
                          temp=0.1, slice_last=slice_last)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


@pytest.mark.parametrize("slice_last,only_multi", [(True, False), (False, False),
                                                   (False, True)])
def test_group_multi_label_ce(slice_last, only_multi):
    S = 13
    logits, targets, spx, spmask = make_case(predignore=not slice_last)
    want = ref_group_ce(logits, targets, spx, spmask, 0.1, S, slice_last,
                        only_multi)
    got = group_multi_label_ce(jnp.asarray(logits), jnp.asarray(targets),
                               jnp.asarray(spx), jnp.asarray(spmask),
                               nseg=S, temp=0.1, slice_last=slice_last,
                               only_multi=only_multi)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_onehot_ce_multihot_choice():
    logits, targets, spx, spmask = make_case(predignore=True)
    # drop empty-target superpixels from the mask (reference asserts they
    # never appear under spmask)
    nonempty = targets.sum(-1) > 0
    B, H, W = spx.shape
    for b in range(B):
        spmask[b] &= nonempty[b][spx[b]]
    want_oh, want_mh = ref_lossdecomp_mc(logits, targets, spx, spmask, 0.1)
    got_oh, got_mh = onehot_ce_multihot_choice(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(spx),
        jnp.asarray(spmask), temp=0.1)
    np.testing.assert_allclose(float(got_oh), want_oh, rtol=1e-5)
    np.testing.assert_allclose(float(got_mh), want_mh, rtol=1e-5)


def test_lossdecomp_combination():
    S = 13
    logits, targets, spx, spmask = make_case(predignore=True)
    nonempty = targets.sum(-1) > 0
    for b in range(spx.shape[0]):
        spmask[b] &= nonempty[b][spx[b]]
    total, aux = lossdecomp(jnp.asarray(logits), jnp.asarray(targets),
                            jnp.asarray(spx), jnp.asarray(spmask), nseg=S)
    want_oh, want_mh = ref_lossdecomp_mc(logits, targets, spx, spmask, 0.1)
    want_g = ref_group_ce(logits, targets, spx, spmask, 0.1, S,
                          slice_last=False, only_multi=True)
    want_total = 16 * want_oh + 8 * want_mh + 1 * want_g
    np.testing.assert_allclose(float(total), want_total, rtol=1e-5)
    np.testing.assert_allclose(float(aux["group_loss"]), want_g, rtol=1e-5)


def test_cross_entropy_temp():
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 5, 5, 4).astype(np.float32)
    labels = rng.randint(0, 4, size=(2, 5, 5))
    labels[0, 0, :] = 255
    p = _softmax(logits / 0.5, axis=-1)
    mask = labels != 255
    want = -np.log(np.take_along_axis(
        p, np.where(mask, labels, 0)[..., None], axis=-1)[..., 0])[mask].mean()
    got = cross_entropy(jnp.asarray(logits), jnp.asarray(labels), temp=0.5)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_focal_gamma0_equals_ce():
    rng = np.random.RandomState(1)
    logits = rng.randn(2, 4, 4, 5).astype(np.float32)
    labels = rng.randint(0, 5, size=(2, 4, 4))
    ce = cross_entropy(jnp.asarray(logits), jnp.asarray(labels), temp=1.0)
    fl = focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=0.0)
    np.testing.assert_allclose(float(fl), float(ce), rtol=1e-6)


def test_rc_multi_choice_ce_runs_and_positive():
    logits, targets, spx, spmask = make_case()
    v = rc_multi_choice_ce(jnp.asarray(logits), jnp.asarray(targets),
                           jnp.asarray(spx), jnp.asarray(spmask), temp=0.1)
    assert float(v) > 0


def test_rcce_matches_manual():
    rng = np.random.RandomState(2)
    B, H, W, C = 1, 3, 3, 4
    logits = rng.randn(B, H, W, C).astype(np.float32)
    t = np.zeros((B, H, W, C + 1), np.float32)
    for i in range(H):
        for j in range(W):
            t[0, i, j, rng.choice(C, 2, replace=False)] = 1
    t[0, 0, 0] = 0
    t[0, 0, 0, -1] = 1  # ignored pixel
    p = _softmax(logits.reshape(-1, C), axis=1)
    tt = t.reshape(-1, C + 1)
    keep = tt[:, -1] == 0
    pos = p * tt[:, :-1]
    w = pos / pos.sum(1, keepdims=True)
    want = -np.log((w * pos).sum(1) + EPS)[keep].mean()
    got = rcce(jnp.asarray(logits), jnp.asarray(t))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)
