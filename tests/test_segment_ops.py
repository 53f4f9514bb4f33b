"""Parity tests for the segment-reduction engine against brute-force numpy
(the torch_scatter semantics the reference relies on)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mulactseg_tpu.ops import (
    seg_context,
    seg_count,
    seg_sum,
    seg_mean,
    seg_max,
    seg_min,
    seg_max_argmax,
    scatter_mean,
    scatter_max,
)
from mulactseg_tpu.ops.segment import seg_sum_onehot_matmul, seg_valid
from mulactseg_tpu.ops.morphology import (
    binary_dilation3x3,
    segment_adjacency,
    boundary_mask,
)


def _np_segment(values, sid, S, reduce):
    P = values.shape[0]
    C = values.shape[1] if values.ndim == 2 else 1
    v = values.reshape(P, C)
    out = np.zeros((S, C), dtype=np.float64)
    cnt = np.zeros(S, dtype=np.int64)
    amax = np.full((S, C), P, dtype=np.int64)
    vmax = np.full((S, C), -np.inf)
    for p in range(P):
        s = sid[p]
        if s >= S:
            continue
        cnt[s] += 1
        out[s] += v[p]
        for c in range(C):
            if v[p, c] > vmax[s, c]:
                vmax[s, c] = v[p, c]
                amax[s, c] = p
    if reduce == "sum":
        return out
    if reduce == "count":
        return cnt
    if reduce == "mean":
        m = out / np.maximum(cnt, 1)[:, None]
        m[cnt == 0] = 0.0
        return m
    if reduce == "max":
        vm = vmax.copy()
        vm[cnt == 0] = 0.0
        return vm
    if reduce == "argmax":
        return amax
    raise ValueError(reduce)


@pytest.fixture(scope="module")
def case():
    rng = np.random.RandomState(0)
    P, S, C = 4096, 37, 5
    sid = rng.randint(0, S + 1, size=P).astype(np.int32)  # includes invalid bucket S
    # make a few segments empty
    sid[sid == 7] = S
    sid[sid == 20] = S
    values = rng.rand(P, C).astype(np.float32)
    return P, S, C, sid, values


def test_count_and_valid(case):
    P, S, C, sid, values = case
    ctx = seg_context(jnp.asarray(sid), S)
    got = np.asarray(seg_count(ctx))
    want = _np_segment(values, sid, S, "count")
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(np.asarray(seg_valid(ctx)), want > 0)


def test_sum_float(case):
    P, S, C, sid, values = case
    ctx = seg_context(jnp.asarray(sid), S)
    got = np.asarray(seg_sum(ctx, jnp.asarray(values)))
    want = _np_segment(values, sid, S, "sum")
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_sum_int_exact(case):
    P, S, C, sid, _ = case
    rng = np.random.RandomState(1)
    iv = rng.randint(0, 100, size=(P, C)).astype(np.int32)
    ctx = seg_context(jnp.asarray(sid), S)
    got = np.asarray(seg_sum(ctx, jnp.asarray(iv)))
    want = _np_segment(iv.astype(np.float64), sid, S, "sum")
    np.testing.assert_array_equal(got, want.astype(np.int64))


def test_sum_onehot_matmul(case):
    P, S, C, sid, values = case
    got = np.asarray(seg_sum_onehot_matmul(jnp.asarray(values), jnp.asarray(sid), S,
                                           chunk=512))
    want = _np_segment(values, sid, S, "sum")
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_mean(case):
    P, S, C, sid, values = case
    got = np.asarray(scatter_mean(jnp.asarray(values), jnp.asarray(sid), S))
    want = _np_segment(values, sid, S, "mean")
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_max_and_fill(case):
    P, S, C, sid, values = case
    ctx = seg_context(jnp.asarray(sid), S)
    got = np.asarray(seg_max(ctx, jnp.asarray(values)))
    want = _np_segment(values, sid, S, "max")
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_min(case):
    P, S, C, sid, values = case
    ctx = seg_context(jnp.asarray(sid), S)
    got = np.asarray(seg_min(ctx, jnp.asarray(values), fill=0.0))
    want = -_np_segment(-values, sid, S, "max")
    cnt = _np_segment(values, sid, S, "count")
    want[cnt == 0] = 0.0
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_max_argmax(case):
    P, S, C, sid, values = case
    vals, idx = scatter_max(jnp.asarray(values), jnp.asarray(sid), S,
                            return_argmax=True)
    vals, idx = np.asarray(vals), np.asarray(idx)
    want_v = _np_segment(values, sid, S, "max")
    want_i = _np_segment(values, sid, S, "argmax")
    np.testing.assert_allclose(vals, want_v, rtol=1e-6, atol=1e-6)
    # argmax: indices must point at a pixel achieving the max in the right segment
    cnt = _np_segment(values, sid, S, "count")
    for s in range(S):
        for c in range(C):
            if cnt[s] == 0:
                assert idx[s, c] == P
            else:
                p = idx[s, c]
                assert sid[p] == s
                assert values[p, c] == pytest.approx(want_v[s, c], rel=1e-6)


def test_masked_wrapper(case):
    P, S, C, sid, values = case
    mask = (np.arange(P) % 3) != 0
    masked_sid = np.where(mask, sid, S)
    got = np.asarray(scatter_mean(jnp.asarray(values), jnp.asarray(sid), S,
                                  mask=jnp.asarray(mask)))
    want = _np_segment(values, masked_sid, S, "mean")
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_vmap_over_batch(case):
    P, S, C, sid, values = case
    rng = np.random.RandomState(3)
    sids = np.stack([sid, rng.randint(0, S + 1, size=P).astype(np.int32)])
    vals = np.stack([values, rng.rand(P, C).astype(np.float32)])

    def one(s, v):
        ctx = seg_context(s, S)
        return seg_max(ctx, v)

    got = np.asarray(jax.vmap(one)(jnp.asarray(sids), jnp.asarray(vals)))
    for b in range(2):
        want = _np_segment(vals[b], sids[b], S, "max")
        np.testing.assert_allclose(got[b], want, rtol=1e-6, atol=1e-6)


def test_grad_flows_through_max():
    # d/dv seg_max picks out the argmax element
    sid = jnp.asarray([0, 0, 1, 1, 1], dtype=jnp.int32)
    v = jnp.asarray([1.0, 3.0, 2.0, 5.0, 4.0])

    def f(v):
        ctx = seg_context(sid, 2)
        return seg_max(ctx, v).sum()

    g = np.asarray(jax.grad(f)(v))
    np.testing.assert_allclose(g, [0, 1, 0, 1, 0], atol=1e-6)


def test_dilation_and_boundary():
    m = np.zeros((8, 8), bool)
    m[4, 4] = True
    d = np.asarray(binary_dilation3x3(jnp.asarray(m)))
    want = np.zeros((8, 8), bool)
    want[3:6, 3:6] = True
    np.testing.assert_array_equal(d, want)

    spx = np.zeros((6, 6), np.int32)
    spx[:, 3:] = 1
    b = np.asarray(boundary_mask(jnp.asarray(spx)))
    assert b[:, 2].all() and b[:, 3].all()
    assert not b[:, 0].any() and not b[:, 5].any()


def test_segment_adjacency():
    spx = np.zeros((6, 6), np.int32)
    spx[:, 2:4] = 1
    spx[:, 4:] = 2
    adj = np.asarray(segment_adjacency(jnp.asarray(spx), 4))
    assert adj[0, 1] and adj[1, 0]
    assert adj[1, 2] and adj[2, 1]
    assert not adj[0, 2] and not adj[2, 0]  # not 3x3-adjacent
    assert not adj[3].any()  # absent segment
    assert adj[0, 0] and adj[1, 1] and adj[2, 2]
