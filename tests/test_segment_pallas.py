"""Pallas segment-max kernel (interpret mode on CPU) and the custom-VJP
segment max vs the scan path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mulactseg_tpu.ops.segment import (
    seg_context,
    seg_max_argmax,
    segment_max_grad,
)
from mulactseg_tpu.ops.segment_pallas import segment_max_pallas


def _case(seed=0, P=2048, S=23, C=7):
    rng = np.random.RandomState(seed)
    sid = rng.randint(0, S + 1, size=P).astype(np.int32)
    sid[sid == 5] = S  # empty segment
    vals = rng.rand(P, C).astype(np.float32) + 0.01
    return sid, vals, P, S, C


def test_pallas_kernel_matches_scan_interpret():
    sid, vals, P, S, C = _case()
    ctx = seg_context(jnp.asarray(sid), S)
    want_v, want_i = seg_max_argmax(ctx, jnp.asarray(vals), fill=0.0)
    g = jnp.take(jnp.asarray(vals), ctx.order, axis=0)
    got_v, got_pos = segment_max_pallas(g, ctx.starts, ctx.ends, fill=0.0,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=1e-6, atol=1e-6)
    # map sorted positions back to pixels and check they achieve the max
    pos = np.asarray(got_pos)
    order = np.asarray(ctx.order)
    for s in range(S):
        for c in range(C):
            if pos[s, c] >= P:
                assert np.asarray(want_i)[s, c] == P
            else:
                p = order[pos[s, c]]
                assert sid[p] == s
                assert vals[p, c] == np.asarray(want_v)[s, c]


@pytest.mark.slow
def test_custom_vjp_value_and_grad_match_scan():
    sid, vals, P, S, C = _case(seed=1, P=512, S=11, C=3)
    sid_j, vals_j = jnp.asarray(sid), jnp.asarray(vals)

    out, argpix = segment_max_grad(vals_j, sid_j, S)
    ctx = seg_context(sid_j, S)
    want_v, want_i = seg_max_argmax(ctx, vals_j, fill=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want_v), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(argpix), np.asarray(want_i))

    # gradient of sum-of-log-max must match autodiff through the scan
    def f_fast(v):
        mx, _ = segment_max_grad(v, sid_j, S)
        return jnp.sum(jnp.log(mx + 1e-8))

    def f_scan(v):
        c = seg_context(sid_j, S)
        from mulactseg_tpu.ops.segment import seg_max
        return jnp.sum(jnp.log(seg_max(c, v, fill=0.0) + 1e-8))

    g_fast = np.asarray(jax.grad(f_fast)(vals_j))
    g_scan = np.asarray(jax.grad(f_scan)(vals_j))
    np.testing.assert_allclose(g_fast, g_scan, rtol=1e-5, atol=1e-6)


def test_group_loss_grad_unchanged_by_fast_path():
    # group_multi_label_ce now uses segment_max_grad; check its gradient
    # against a numerically identical direct formulation
    from mulactseg_tpu.losses import group_multi_label_ce
    rng = np.random.RandomState(2)
    B, H, W, C, S = 2, 6, 6, 4, 5
    logits = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    targets = jnp.asarray((rng.rand(B, S, C) < 0.4), jnp.float32)
    spx = jnp.asarray(rng.randint(0, S, (B, H, W)), jnp.int32)
    mask = jnp.asarray(rng.rand(B, H, W) < 0.8)

    def f(lg):
        return group_multi_label_ce(lg, targets, spx, mask, nseg=S,
                                    temp=0.5, slice_last=False)

    g = jax.grad(f)(logits)
    assert np.isfinite(np.asarray(g)).all()
    # finite-difference spot check
    eps = 1e-3
    d = np.zeros((B, H, W, C), np.float32)
    d[0, 2, 3, 1] = 1.0
    fd = (float(f(logits + eps * d)) - float(f(logits - eps * d))) / (2 * eps)
    np.testing.assert_allclose(float((np.asarray(g) * d).sum()), fd,
                               rtol=0.08, atol=5e-4)


def test_scatter_softmax_bwd_nchw_matches_dense():
    """The one-kernel NCHW group-term backward (flat cell-major scatter
    buffer + in-register softmax recompute) against the dense fallback
    formula of segment.py _ssm_nchw_bwd, and through the full VJP wiring
    (index computation included)."""
    from mulactseg_tpu.ops import segment as seg
    from mulactseg_tpu.ops.segment_pallas import (
        NCHW_CHUNK,
        scatter_softmax_bwd_nchw,
    )

    rng = np.random.RandomState(3)
    B, C, HW, nseg = 2, 5, 2 * NCHW_CHUNK, 16
    S = B * nseg
    temp = 0.1
    logits = jnp.asarray(rng.randn(B, C, HW), jnp.float32)
    G = HW // NCHW_CHUNK

    # sparse entries: a random subset of (segment, class) argmax pixels
    pix = np.full((S, C), B * HW, np.int32)
    coef = np.zeros((S, C), np.float32)
    live = rng.rand(S, C) < 0.6
    pix[live] = rng.randint(0, B * HW, size=int(live.sum()))
    coef[live] = rng.randn(int(live.sum())).astype(np.float32)

    # dense reference
    dense = np.zeros((B, C, HW), np.float32)
    for s in range(S):
        for c in range(C):
            p = pix[s, c]
            if p < B * HW:
                dense[p // HW, c, p % HW] += coef[s, c]
    sm = np.asarray(jax.nn.softmax(logits / temp, axis=1))
    want = (dense - dense.sum(1, keepdims=True) * sm) / temp

    # kernel path: flat cell-major buffer
    flat = np.zeros(B * C * HW, np.float32)
    for s in range(S):
        for c in range(C):
            p = pix[s, c]
            if p < B * HW:
                b, hw = p // HW, p % HW
                cell, off = hw // NCHW_CHUNK, hw % NCHW_CHUNK
                flat[((b * G + cell) * C + c) * NCHW_CHUNK + off] += \
                    coef[s, c]
    got = scatter_softmax_bwd_nchw(logits, jnp.asarray(flat), temp,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)

    # full VJP wiring: _ssm_nchw_bwd builds the same flat buffer from the
    # residuals; vals at the argmax mirror the forward contract
    vals = np.zeros((S, C), np.float32)
    vals[live] = rng.rand(int(live.sum())).astype(np.float32)
    g_ct = np.zeros((S, C), np.float32)
    g_ct[live] = rng.randn(int(live.sum())).astype(np.float32)
    res = (logits, jnp.asarray(vals), jnp.asarray(pix))
    cts = (jnp.asarray(g_ct), jnp.zeros((S, C), jnp.int32))
    dl_dense, _ = seg._ssm_nchw_bwd(S, temp, res, cts)
    import os
    os.environ["MULACTSEG_FORCE_PALLAS_INTERPRET"] = "1"
    try:
        dl_pallas, _ = seg._ssm_nchw_bwd(S, temp, res, cts)
    finally:
        del os.environ["MULACTSEG_FORCE_PALLAS_INTERPRET"]
    np.testing.assert_allclose(np.asarray(dl_pallas), np.asarray(dl_dense),
                               rtol=1e-5, atol=1e-5)
