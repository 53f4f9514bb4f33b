"""Hierarchy-loss parity vs brute-force transcriptions of
utils/loss.py:143-235 (hier), :341-437 (async), :439-533 (aug)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mulactseg_tpu.losses.hier import (
    async_hier_group_multi_label_ce,
    aug_hier_group_multi_label_ce,
    hier_group_multi_label_ce,
)

EPS = 1e-8


def _softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def make_case(seed, B=2, H=8, W=8, C=5, S=7, SS=13):
    rng = np.random.RandomState(seed)
    logits = rng.randn(B, H, W, C - 1).astype(np.float32)
    spx = rng.randint(0, S, (B, H, W)).astype(np.int32)
    small = rng.randint(0, SS, (B, H, W)).astype(np.int32)
    targets = np.zeros((B, S, C), np.float32)
    for b in range(B):
        for s in range(S):
            targets[b, s, rng.choice(C, rng.randint(1, 3), replace=False)] = 1
    mask = rng.rand(B, H, W) < 0.7
    return logits, spx, small, targets, mask


def ref_hier(logits, spx, small, targets, mask, S, SS, temp, only_single,
             border_strip=False):
    B, H, W, Cm = logits.shape
    probs = _softmax(logits.reshape(B, -1, Cm) / temp, 2)
    spxf = spx.reshape(B, -1)
    smallf = small.reshape(B, -1)
    maskf = mask.reshape(B, -1)
    loss, num = 0.0, 1
    for i in range(B):
        trg = targets[i][:, :-1].copy()
        if border_strip:
            border = np.unique(np.concatenate(
                [spx[i][0], spx[i][-1], spx[i][:, 0], spx[i][:, -1]]))
            trg[border[border < S]] = 0
        m = maskf[i]
        if not m.any():
            continue
        vo = probs[i][m]
        vb = spxf[i][m]
        vs = smallf[i][m]
        # per (S, Cm) argmax over valid pixels
        arg = np.full((S, Cm), -1)
        best = np.full((S, Cm), -np.inf)
        for p in range(len(vo)):
            s = vb[p]
            for c in range(Cm):
                if vo[p, c] > best[s, c]:
                    best[s, c] = vo[p, c]
                    arg[s, c] = p
        sums = np.zeros((SS, Cm))
        sizes = np.zeros(SS, np.int64)
        for p in range(len(vo)):
            sums[vs[p]] += -np.log(vo[p] + EPS)
            sizes[vs[p]] += 1
        for s in range(S):
            if arg[s, 0] < 0:
                continue
            row = trg[s]
            if only_single and row.sum() <= 1:
                continue
            for c in range(Cm):
                if row[c] > 0:
                    sel = vs[arg[s, c]]
                    loss += sums[sel, c]
                    num += sizes[sel]
    return loss / num


@pytest.mark.parametrize("only_single", [False, True])
def test_hier_group(only_single):
    S, SS = 7, 13
    logits, spx, small, targets, mask = make_case(0)
    want = ref_hier(logits, spx, small, targets, mask, S, SS, 0.1, only_single)
    got = hier_group_multi_label_ce(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(spx),
        jnp.asarray(small), jnp.asarray(mask), nseg=S, small_nseg=SS,
        temp=0.1, only_single=only_single)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_aug_hier_strips_border():
    S, SS = 7, 13
    logits, spx, small, targets, mask = make_case(1)
    want = ref_hier(logits, spx, small, targets, mask, S, SS, 0.1, False,
                    border_strip=True)
    got = aug_hier_group_multi_label_ce(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(spx),
        jnp.asarray(small), jnp.asarray(mask), nseg=S, small_nseg=SS,
        temp=0.1)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def ref_async(logits_s, logits_w, spx_w, small_s, small_w, targets, mask_s,
              mask_w, S, SS, temp, weight_reduce):
    B, H, W, Cm = logits_s.shape
    ps = _softmax(logits_s.reshape(B, -1, Cm) / temp, 2)
    pw = _softmax(logits_w.reshape(B, -1, Cm) / temp, 2)
    spw = spx_w.reshape(B, -1)
    sss = small_s.reshape(B, -1)
    ssw = small_w.reshape(B, -1)
    ms = mask_s.reshape(B, -1)
    mw = mask_w.reshape(B, -1)
    loss, num = 0.0, 1
    for i in range(B):
        if not ms[i].any():
            continue
        v_o = ps[i][ms[i]]
        vsm = sss[i][ms[i]]
        vw = pw[i][mw[i]]
        vwb = spw[i][mw[i]]
        vws = ssw[i][mw[i]]
        arg = np.full((S, Cm), -1)
        best = np.full((S, Cm), -np.inf)
        for p in range(len(vw)):
            s = vwb[p]
            for c in range(Cm):
                if vw[p, c] > best[s, c]:
                    best[s, c] = vw[p, c]
                    arg[s, c] = p
        sums = np.zeros((SS, Cm))
        sizes = np.zeros(SS, np.int64)
        for p in range(len(v_o)):
            sums[vsm[p]] += -np.log(v_o[p] + EPS)
            sizes[vsm[p]] += 1
        wred = np.zeros((SS, Cm))
        cnt = np.zeros(SS)
        for p in range(len(vw)):
            if weight_reduce == "max":
                wred[vws[p]] = np.maximum(wred[vws[p]], vw[p])
            else:
                wred[vws[p]] += vw[p]
                cnt[vws[p]] += 1
        if weight_reduce == "mean":
            wred = wred / np.maximum(cnt, 1)[:, None]
        for s in range(S):
            if arg[s, 0] < 0:
                continue
            for c in range(Cm):
                if targets[i, s, c] > 0 and c < Cm:
                    sel = vws[arg[s, c]]
                    v = sums[sel, c]
                    if weight_reduce:
                        v = v * wred[sel, c]
                    loss += v
                    if v != 0:
                        num += sizes[sel]
    return loss / num


@pytest.mark.parametrize("weight_reduce", [None, "max", "mean"])
def test_async_hier(weight_reduce):
    S, SS = 7, 13
    rng = np.random.RandomState(2)
    B, H, W, Cm = 2, 8, 8, 4
    logits_s = rng.randn(B, H, W, Cm).astype(np.float32)
    logits_w = rng.randn(B, H, W, Cm).astype(np.float32)
    spx_w = rng.randint(0, S, (B, H, W)).astype(np.int32)
    small_s = rng.randint(0, SS, (B, H, W)).astype(np.int32)
    small_w = rng.randint(0, SS, (B, H, W)).astype(np.int32)
    targets = np.zeros((B, S, Cm + 1), np.float32)
    for b in range(B):
        for s in range(S):
            targets[b, s, rng.choice(Cm, rng.randint(1, 3), replace=False)] = 1
    mask_s = rng.rand(B, H, W) < 0.7
    mask_w = rng.rand(B, H, W) < 0.7
    want = ref_async(logits_s, logits_w, spx_w, small_s, small_w, targets,
                     mask_s, mask_w, S, SS, 0.1, weight_reduce)
    got = async_hier_group_multi_label_ce(
        jnp.asarray(logits_s), jnp.asarray(logits_w), jnp.asarray(targets),
        jnp.asarray(spx_w), jnp.asarray(small_s), jnp.asarray(small_w),
        jnp.asarray(mask_s), jnp.asarray(mask_w), nseg=S, small_nseg=SS,
        temp=0.1, weight_reduce=weight_reduce)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)
