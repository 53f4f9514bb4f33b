"""Fused bitmask lossdecomp (losses/fused.py) parity against the composed
reference-faithful implementation (losses/partial.lossdecomp): identical
values AND gradients, plus the bit packer and the softmax-fused segment-max
kernel in interpret mode."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mulactseg_tpu.losses.fused import (
    bits_to_multihot,
    lossdecomp_fused,
    pixel_target_bits,
    pixel_target_bits_jnp,
)
from mulactseg_tpu.losses import lossdecomp
from mulactseg_tpu.ops.segment import seg_context, segment_softmax_max


def _case(seed=0, B=2, H=24, W=24, S=16, C=6):
    rng = np.random.RandomState(seed)
    logits = rng.randn(B, H, W, C).astype(np.float32)
    target = (rng.rand(B, S, C) < 0.3).astype(np.float32)
    target[:, :4] = 0.0
    target[0, 4] = np.eye(C)[0]  # guarantee a one-hot segment
    gy = (np.arange(H) * 4 // H)
    gx = (np.arange(W) * 4 // W)
    spx = np.broadcast_to((gy[:, None] * 4 + gx[None, :]).astype(np.int32),
                          (B, H, W))
    spmask = rng.rand(B, H, W) < 0.7
    bits = np.stack([pixel_target_bits(target[b], spx[b], spmask[b])
                     for b in range(B)])
    return logits, target, spx, spmask, bits, S


def test_bit_packers_agree():
    logits, target, spx, spmask, bits, S = _case()
    got = pixel_target_bits_jnp(jnp.asarray(target), jnp.asarray(spx),
                                jnp.asarray(spmask))
    np.testing.assert_array_equal(np.asarray(got), bits)
    # unpack round-trips
    mh = np.asarray(bits_to_multihot(jnp.asarray(bits), target.shape[-1]))
    want = target[np.arange(2)[:, None, None], spx] * spmask[..., None]
    np.testing.assert_array_equal(mh, want)


@pytest.mark.slow
def test_lossdecomp_fused_matches_composed():
    logits, target, spx, spmask, bits, S = _case()
    kw = dict(nseg=S, coeff=16.0, coeff_mc=8.0, coeff_gm=1.0,
              multi_ce_temp=0.1, group_ce_temp=0.1)

    def f_ref(lg):
        return lossdecomp(lg, jnp.asarray(target), jnp.asarray(spx),
                          jnp.asarray(spmask), **kw)[0]

    def f_fused(lg):
        return lossdecomp_fused(lg, jnp.asarray(bits), jnp.asarray(target),
                                jnp.asarray(spx), **kw)[0]

    lg = jnp.asarray(logits)
    v_ref, g_ref = jax.value_and_grad(f_ref)(lg)
    v_fused, g_fused = jax.value_and_grad(f_fused)(lg)
    np.testing.assert_allclose(float(v_fused), float(v_ref), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-6)

    _, aux_ref = lossdecomp(lg, jnp.asarray(target), jnp.asarray(spx),
                            jnp.asarray(spmask), **kw)
    _, aux_fused = lossdecomp_fused(lg, jnp.asarray(bits),
                                    jnp.asarray(target), jnp.asarray(spx),
                                    **kw)
    for k in ("ce_loss", "mc_loss", "group_loss"):
        np.testing.assert_allclose(float(aux_fused[k]), float(aux_ref[k]),
                                   rtol=2e-5, err_msg=k)


def test_segment_softmax_max_grad_matches_dense():
    rng = np.random.RandomState(1)
    P, S, C = 512, 12, 5
    sid = rng.randint(0, S + 1, size=P).astype(np.int32)
    u = rng.randn(P, C).astype(np.float32)
    w = jnp.asarray(rng.rand(S, C).astype(np.float32))

    def via_op(x):
        mx, _ = segment_softmax_max(x, jnp.asarray(sid), S)
        return jnp.sum(mx * w)

    def dense(x):
        # brute force: per segment, max of softmax probs over member pixels
        probs = jax.nn.softmax(x, axis=-1)
        out = [jnp.max(jnp.where(jnp.asarray(sid == s)[:, None], probs, 0.0),
                       axis=0) for s in range(S)]
        return jnp.sum(jnp.stack(out) * w)

    v1, g1 = jax.value_and_grad(via_op)(jnp.asarray(u))
    v2, g2 = jax.value_and_grad(dense)(jnp.asarray(u))
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-7)


def test_segment_softmax_max_pallas_interpret():
    from mulactseg_tpu.ops.segment_pallas import (
        LANES,
        segment_softmax_max_pallas,
    )

    rng = np.random.RandomState(2)
    P, S, C = 2048, 23, 7
    sid = rng.randint(0, S + 1, size=P).astype(np.int32)
    sid[sid == 5] = S  # empty segment
    u = rng.randn(P, C).astype(np.float32)
    ctx = seg_context(jnp.asarray(sid), S)
    g = jnp.take(jnp.pad(jnp.asarray(u), ((0, 0), (0, LANES - C)),
                         constant_values=-1e30), ctx.order, axis=0)
    got_v, got_pos = segment_softmax_max_pallas(g, ctx.starts, ctx.ends,
                                                num_classes=C,
                                                interpret=True)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(u), axis=-1))
    for s in range(S):
        m = sid == s
        want = probs[m].max(0) if m.any() else np.zeros(C)
        np.testing.assert_allclose(np.asarray(got_v)[s, :C], want,
                                   rtol=1e-5, atol=1e-7, err_msg=str(s))
    assert (np.asarray(got_pos)[5, :C] == P).all()


def test_pixel_partial_ce_pallas_interpret():
    from mulactseg_tpu.ops.pixel_loss_pallas import (
        _bwd_pallas,
        _dense_fwd,
        _fwd_pallas,
    )

    rng = np.random.RandomState(3)
    N, C = 1000, 6  # non-multiple of ROWS exercises the padding path
    x = jnp.asarray(rng.randn(N, C).astype(np.float32))
    bits = jnp.asarray(rng.randint(0, 2 ** C, N).astype(np.int32))
    bits = bits * (rng.rand(N) < 0.8)  # some invalid pixels
    want = _dense_fwd(x, bits, 0.1)
    got = _fwd_pallas(x, bits, 0.1, interpret=True)
    for w, g in zip(want, got):
        np.testing.assert_allclose(float(g), float(w), rtol=1e-5)

    # backward parity vs autodiff of the dense forward
    def dense_loss(xx):
        a, b, c, d = _dense_fwd(xx, bits, 0.1)
        return 2.0 * a + 3.0 * c

    g_ref = jax.grad(dense_loss)(x)
    g_got = _bwd_pallas(x, bits, jnp.float32(2.0), jnp.float32(3.0), 0.1,
                        interpret=True)
    # analytic vs autodiff chain differ only by f32 cancellation noise in
    # saturated-softmax rows (pos ~ 1.0 at temp 0.1): allow ~3e-6 absolute
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=5e-3, atol=1e-5)


@pytest.mark.slow
def test_ssm_block_prereduction_parity():
    """The raster-block pre-reduction inside the pallas _ssm_impl path
    (ops/segment.py _BLOCK) must match the CPU fallback exactly: same max
    probs AND the same first-max argmax pixel, on data with realistic
    run structure (contiguous same-sid spans) plus deliberate ties."""
    import os
    import subprocess
    import sys

    code = r"""
import os
os.environ["MULACTSEG_FORCE_PALLAS_INTERPRET"] = "1"
os.environ["MULACTSEG_SSM_PREREDUCE"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from mulactseg_tpu.ops.segment import _ssm_impl, seg_context, seg_max_argmax

rng = np.random.RandomState(0)
S = 9
# contiguous runs of random lengths + invalid spans
sid_list = []
while len(sid_list) < 301:
    s = rng.randint(0, S + 1)  # S == invalid marker
    sid_list += [s] * rng.randint(1, 9)
sid = np.array(sid_list[:301], np.int32)
x = rng.randn(301, 6).astype(np.float32)
x[5] = x[6]  # tie inside one block
x[40] = x[44]  # tie across blocks

got_v, got_pix = _ssm_impl(jnp.asarray(x), jnp.asarray(sid), S)

probs = jax.nn.softmax(jnp.asarray(x), axis=-1)
ctx = seg_context(jnp.asarray(sid), S)
want_v, want_pix = seg_max_argmax(ctx, probs, fill=0.0)

# max probs are carried through the gather stream in bf16 (as the old
# in-kernel-softmax path carried bf16 scaled logits) -> bf16 tolerance
np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                           rtol=5e-3, atol=5e-3)
np.testing.assert_array_equal(np.asarray(got_pix), np.asarray(want_pix))
print("SSM_PARITY_OK")
"""
    env = dict(os.environ)
    env.pop("MULACTSEG_NO_PALLAS", None)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=600)
    assert "SSM_PARITY_OK" in out.stdout, out.stdout + out.stderr


def test_pixel_target_bits_handles_pad_ids():
    """Crop padding writes spx == nseg (transform.py:62); the packer must
    not crash and padded pixels must pack to 0."""
    import numpy as np

    from mulactseg_tpu.losses.fused import pixel_target_bits

    target = np.eye(4, 5, dtype=np.float32)  # 4 superpixels, 5 classes
    spx = np.array([[0, 1], [4, 4]], np.int32)  # 4 == nseg pad value
    spmask = np.array([[True, True], [False, False]])
    bits = pixel_target_bits(target, spx, spmask)
    assert bits[0, 0] == 1 and bits[0, 1] == 2
    assert (bits[1] == 0).all()


def test_pixel_partial_ce_nchw_interpret():
    """Channels-on-sublanes kernel (B, C, HW) matches the dense row-major
    reference, forward and backward."""
    from mulactseg_tpu.ops.pixel_loss_pallas import (
        CHUNK,
        _bwd_pallas_cs,
        _dense_fwd,
        _fwd_pallas_cs,
    )

    rng = np.random.RandomState(5)
    B, C, HW = 2, 6, 2 * CHUNK
    xc = jnp.asarray(rng.randn(B, C, HW).astype(np.float32))
    bits = rng.randint(0, 2 ** C, (B, 1, HW)).astype(np.int32)
    bits = jnp.asarray(bits * (rng.rand(B, 1, HW) < 0.8))
    rows = jnp.swapaxes(xc, 1, 2).reshape(B * HW, C)
    want = _dense_fwd(rows, bits.reshape(-1), 0.1)
    got = _fwd_pallas_cs(xc, bits, 0.1, interpret=True)
    for w, g in zip(want, got):
        np.testing.assert_allclose(float(g), float(w), rtol=1e-5)

    def dense_loss(r):
        a, _, c, _ = _dense_fwd(r, bits.reshape(-1), 0.1)
        return 2.0 * a + 3.0 * c

    g_ref = jax.grad(dense_loss)(rows)
    g_got = _bwd_pallas_cs(xc, bits, jnp.float32(2.0), jnp.float32(3.0),
                           0.1, interpret=True)
    g_got_rows = jnp.swapaxes(g_got, 1, 2).reshape(B * HW, C)
    np.testing.assert_allclose(np.asarray(g_got_rows), np.asarray(g_ref),
                               rtol=5e-3, atol=1e-5)


@pytest.mark.slow
def test_lossdecomp_fused_nchw_path_matches_row_path():
    """The CHUNK-divisible (nchw kernel) and the row-kernel dispatch of
    lossdecomp_fused agree on CPU (both hit dense fallbacks; pins the
    bitcast/transpose plumbing)."""
    from mulactseg_tpu.losses.fused import lossdecomp_fused

    rng = np.random.RandomState(7)
    B, H, W, C, S = 2, 32, 64, 6, 9   # H*W = 2048 = CHUNK
    logits = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    spx = rng.randint(0, S, (B, H, W)).astype(np.int32)
    spm = rng.rand(B, H, W) < 0.6
    tgt = (rng.rand(B, S, C) < 0.4).astype(np.float32)
    bits = np.stack([pixel_target_bits(tgt[b], spx[b], spm[b])
                     for b in range(B)])
    t1, a1 = lossdecomp_fused(logits, jnp.asarray(bits), jnp.asarray(tgt),
                              jnp.asarray(spx), nseg=S)
    # odd W makes H*W non-divisible -> row path
    t2, a2 = lossdecomp_fused(logits[:, :, :63], jnp.asarray(bits[:, :, :63]),
                              jnp.asarray(tgt), jnp.asarray(spx[:, :, :63]),
                              nseg=S)
    assert np.isfinite(float(t1)) and np.isfinite(float(t2))
    # divisible case really used the nchw path: recompute it via row path
    from mulactseg_tpu.ops.pixel_loss_pallas import pixel_partial_ce

    lg = logits.reshape(-1, C)
    want = pixel_partial_ce(lg, jnp.asarray(bits.reshape(-1)), 0.1)
    ce = float(want[0]) / (1.0 + float(want[1]))
    np.testing.assert_allclose(float(a1["ce_loss"]), ce, rtol=1e-5)


def test_prereduce_nchw_matches_row_kernel():
    """NCHW pre-reduce (softmax + block merge + pad in one pass) matches
    the row-major prereduce kernel in interpret mode."""
    from mulactseg_tpu.ops.segment_pallas import (
        NCHW_CHUNK,
        prereduce_softmax_blocks,
        prereduce_softmax_nchw,
    )

    rng = np.random.RandomState(11)
    B, C, HW, R, S = 2, 6, NCHW_CHUNK, 4, 9
    temp = 0.1
    lg = rng.randn(B, C, HW).astype(np.float32)
    # raster-ish sid runs: blocks of random length share an id
    sid = np.repeat(rng.randint(0, S, (B, HW // 8)), 8, axis=1)
    sid[rng.rand(B, HW) < 0.05] = S  # some dummy rows

    got_v, got_c = prereduce_softmax_nchw(
        jnp.asarray(lg), jnp.asarray(sid[:, None, :]), R, temp,
        interpret=True)
    rows = jnp.asarray(np.swapaxes(lg, 1, 2).reshape(B * HW, C) / temp)
    want_v, want_c = prereduce_softmax_blocks(
        rows, jnp.asarray(sid.reshape(-1)), R, S, interpret=True)
    np.testing.assert_allclose(np.asarray(got_v, np.float32),
                               np.asarray(want_v, np.float32),
                               rtol=0, atol=1e-2)  # bf16 rounding
    np.testing.assert_array_equal(np.asarray(got_c), np.asarray(want_c))


@pytest.mark.parametrize("gather_chunk", [None, "1024"])
def test_segment_softmax_max_nchw_matches_row(monkeypatch, gather_chunk):
    """NCHW group-term entry point (kernel impl, interpret mode) matches
    the row-major segment_softmax_max forward and backward.

    gather_chunk=1024 divides HW and (with MULACTSEG_PERIMAGE_SORT=1)
    activates the opt-in per-image packed-sort path — both must agree
    with the row-major reference."""
    from mulactseg_tpu.ops.segment import (
        segment_softmax_max,
        segment_softmax_max_nchw,
    )
    from mulactseg_tpu.ops.segment_pallas import NCHW_CHUNK

    monkeypatch.setenv("MULACTSEG_FORCE_PALLAS_INTERPRET", "1")
    # pin the legacy sorted pipeline: this test compares bf16-rounding
    # points with the row prereduce path; the default sort-free scatter
    # path is f32-exact and has its own dense-exact tests above
    monkeypatch.setenv("MULACTSEG_NCHW_SCATTER", "0")
    if gather_chunk is not None:
        monkeypatch.setenv("MULACTSEG_GATHER_CHUNK", gather_chunk)
        monkeypatch.setenv("MULACTSEG_PERIMAGE_SORT", "1")
    rng = np.random.RandomState(13)
    B, C, HW, S = 2, 6, NCHW_CHUNK, 40
    temp = 1.0  # unsaturated probs so the loss comparison has signal
    lg = rng.randn(B, C, HW).astype(np.float32)
    sid = np.repeat(rng.randint(0, S + 1, (B, HW // 8)), 8, axis=1)
    sid = np.where(sid >= S, 2 * S, sid)  # dummy bucket rows
    sid_flat = (sid + (np.arange(B)[:, None] * S)).reshape(-1)
    sid_flat = np.where(sid_flat >= 2 * S, B * S, np.minimum(sid_flat,
                                                             B * S))

    rows = np.swapaxes(lg, 1, 2).reshape(B * HW, C)

    def loss_nchw(x):
        mx, _ = segment_softmax_max_nchw(x, jnp.asarray(sid_flat), B * S,
                                         temp)
        return jnp.sum(-jnp.log(mx + 1e-8) * (mx > 0)), mx

    def loss_rows(r):
        mx, _ = segment_softmax_max(r / temp, jnp.asarray(sid_flat), B * S)
        return jnp.sum(-jnp.log(mx + 1e-8) * (mx > 0)), mx

    (l1, mx1), g1 = jax.value_and_grad(loss_nchw, has_aux=True)(
        jnp.asarray(lg))
    # compare against the row-major PRE-REDUCE flavor: it rounds at the
    # same point (f32 softmax -> bf16 probs), so argmax tie-breaks match;
    # the default row path rounds the logits instead and flips ~0.1% of
    # near-tie argmax pixels (both are valid subgradients)
    monkeypatch.setenv("MULACTSEG_SSM_PREREDUCE", "1")
    (l2, mx2), g2 = jax.value_and_grad(loss_rows, has_aux=True)(
        jnp.asarray(rows))
    monkeypatch.delenv("MULACTSEG_SSM_PREREDUCE")
    np.testing.assert_allclose(np.asarray(mx1), np.asarray(mx2),
                               rtol=0, atol=1e-2)  # bf16 gather stream
    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-2)
    g2_nchw = np.swapaxes(np.asarray(g2).reshape(B, HW, C), 1, 2)
    np.testing.assert_allclose(np.asarray(g1), g2_nchw, rtol=0.1,
                               atol=2e-3)


@pytest.mark.parametrize("dbl", [2, 6, 11])
def test_scatter_softmax_max_nchw_matches_dense(dbl):
    """Sort-free scatter-max kernel (interpret mode) reproduces the dense
    f32 reference exactly — values and first-argmax pixel indices — at
    every doubling depth (dbl < log2(CHUNK) splits long runs into several
    accumulator updates, which must still merge exactly)."""
    from mulactseg_tpu.ops.segment import seg_context, seg_max_argmax
    from mulactseg_tpu.ops.segment_pallas import (
        NCHW_CHUNK,
        scatter_softmax_max_nchw,
    )

    rng = np.random.RandomState(23)
    B, C, HW, S_img = 2, 6, 2 * NCHW_CHUNK, 9
    S = B * S_img
    # exactly-representable temp: the kernel scales by 1/temp where the
    # dense path divides by temp — at temp 0.1 the two differ by 1 ulp,
    # which puts different (saturated) pixels in the p == 1.0 tie set and
    # flips the first-argmax. x * 2.0 == x / 0.5 exactly, so the only
    # ties are the constructed duplicate columns.
    temp = 0.5
    lg = rng.randn(B, C, HW).astype(np.float32)
    # raster runs (some crossing chunk borders) + dummy stretches; a few
    # duplicated probability rows to exercise first-argmax tie-breaking
    sid = np.repeat(rng.randint(0, S_img + 1, (B, HW // 16)), 16, axis=1)
    lg[:, :, 1::2] = lg[:, :, ::2]  # adjacent pixel pairs tie exactly
    gsid = np.where(sid >= S_img, S,
                    sid + np.arange(B)[:, None] * S_img).reshape(-1)

    mx, pix = scatter_softmax_max_nchw(
        jnp.asarray(lg), jnp.asarray(gsid.reshape(B, 1, HW)), temp, S,
        interpret=True, dbl=dbl)
    rows = jnp.asarray(np.swapaxes(lg, 1, 2).reshape(B * HW, C))
    probs = jax.nn.softmax(rows / temp, axis=-1)
    want_mx, want_pix = seg_max_argmax(
        seg_context(jnp.asarray(gsid), S), probs, fill=0.0)
    np.testing.assert_allclose(np.asarray(mx), np.asarray(want_mx),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(pix), np.asarray(want_pix))


def test_scatter_softmax_max_nchw_underflow_zero_probs():
    """Regression: at group temp 0.1 a >=~10.4 logit gap makes the f32
    softmax underflow to exactly 0.0 for the trailing class at EVERY
    pixel of a segment. The scatter kernel's accumulator must still
    record a real argmax pixel for that (segment, class) — a 0.0 row has
    to beat the init — or the fused loss drops the whole segment
    (present = pix < P). Absent segments must keep the 0.0 fill."""
    from mulactseg_tpu.ops.segment import seg_context, seg_max_argmax
    from mulactseg_tpu.ops.segment_pallas import (
        NCHW_CHUNK,
        scatter_softmax_max_nchw,
    )

    rng = np.random.RandomState(31)
    B, C, HW, S_img = 1, 4, NCHW_CHUNK, 5
    S = B * S_img
    temp = 0.1
    lg = rng.randn(B, C, HW).astype(np.float32)
    lg[:, 0, :] -= 40.0   # class 0 underflows everywhere: exp(-400+) == 0
    lg[:, 1, :] += 40.0   # class 1 saturates to prob 1.0 everywhere
    sid = np.repeat(rng.randint(0, S_img + 2, (B, HW // 32)), 32, axis=1)
    gsid = np.where(sid >= S_img, S, sid).reshape(-1)  # ids S_img+ absent

    mx, pix = scatter_softmax_max_nchw(
        jnp.asarray(lg), jnp.asarray(gsid.reshape(B, 1, HW)), temp, S,
        interpret=True, dbl=6)
    rows = jnp.asarray(np.swapaxes(lg, 1, 2).reshape(B * HW, C))
    probs = jax.nn.softmax(rows / temp, axis=-1)
    want_mx, want_pix = seg_max_argmax(
        seg_context(jnp.asarray(gsid), S), probs, fill=0.0)
    present = np.asarray(want_pix) < B * HW
    assert np.asarray(probs).min() == 0.0  # the underflow regime is hit
    assert present[:, 0].any()             # incl. for class 0
    np.testing.assert_array_equal(np.asarray(pix), np.asarray(want_pix))
    np.testing.assert_allclose(np.asarray(mx), np.asarray(want_mx),
                               rtol=1e-6)


@pytest.mark.slow
def test_segment_softmax_max_nchw_scatter_grad_matches_dense():
    """The NCHW entry point on the scatter path (opt-in) agrees with
    the dense fallback in value and gradient — pins the custom-VJP wiring
    over the new forward."""
    from mulactseg_tpu.ops.segment import (
        _ssm_nchw_dense,
        segment_softmax_max_nchw,
    )
    from mulactseg_tpu.ops.segment_pallas import NCHW_CHUNK

    os.environ["MULACTSEG_FORCE_PALLAS_INTERPRET"] = "1"
    os.environ["MULACTSEG_NCHW_SCATTER"] = "1"
    try:
        rng = np.random.RandomState(29)
        B, C, HW, S_img = 2, 6, NCHW_CHUNK, 11
        S = B * S_img
        lg = rng.randn(B, C, HW).astype(np.float32)
        sid = np.repeat(rng.randint(0, S_img + 1, (B, HW // 8)), 8, axis=1)
        gsid = np.where(sid >= S_img, S,
                        sid + np.arange(B)[:, None] * S_img).reshape(-1)

        def loss(x, fn):
            mx, _ = fn(x, jnp.asarray(gsid), S, 0.5)
            return jnp.sum(-jnp.log(mx + 1e-8) * (mx > 0))

        l1, g1 = jax.value_and_grad(loss)(jnp.asarray(lg),
                                          fn=segment_softmax_max_nchw)
        l2, g2 = jax.value_and_grad(loss)(jnp.asarray(lg),
                                          fn=_ssm_nchw_dense)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-7)
    finally:
        del os.environ["MULACTSEG_FORCE_PALLAS_INTERPRET"]
        del os.environ["MULACTSEG_NCHW_SCATTER"]


def test_segment_softmax_max_nchw_dense_fallback():
    """CPU dense fallback of the NCHW entry point matches the row path
    exactly (both dense)."""
    from mulactseg_tpu.ops.segment import (
        segment_softmax_max_nchw,
        seg_context,
        seg_max_argmax,
    )

    rng = np.random.RandomState(17)
    B, C, HW, S = 2, 5, 64, 7
    temp = 0.5
    lg = rng.randn(B, C, HW).astype(np.float32)
    sid = rng.randint(0, S + 1, B * HW)
    mx, pix = segment_softmax_max_nchw(jnp.asarray(lg), jnp.asarray(sid),
                                       S, temp)
    rows = jnp.asarray(np.swapaxes(lg, 1, 2).reshape(B * HW, C))
    probs = jax.nn.softmax(rows / temp, axis=-1)
    want_mx, want_pix = seg_max_argmax(
        seg_context(jnp.asarray(sid), S), probs, fill=0.0)
    np.testing.assert_allclose(np.asarray(mx), np.asarray(want_mx),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(pix), np.asarray(want_pix))


@pytest.mark.slow
def test_scatter_softmax_max_nchw_production_shape():
    """Scatter kernel at production-like structure: C=20 classes, B=2,
    irregular SEEDS-like runs over 2 chunks, ~64 segments/image with some
    absent + a dummy stretch — values and first-argmax pixels must equal
    the dense f32 reference exactly (the config the default-flip decision
    rides on)."""
    from mulactseg_tpu.data.synthetic import irregular_superpixels
    from mulactseg_tpu.ops.segment import seg_context, seg_max_argmax
    from mulactseg_tpu.ops.segment_pallas import (
        NCHW_CHUNK,
        scatter_softmax_max_nchw,
    )

    rng = np.random.RandomState(41)
    B, C, S_img = 2, 20, 64
    HW = 2 * NCHW_CHUNK
    S = B * S_img
    lg = rng.randn(B, C, HW).astype(np.float32)
    rows_hw = 64  # treat the pixel axis as a (64, 64) image for SEEDS runs
    sid = np.stack([
        irregular_superpixels(rows_hw, HW // rows_hw, S_img, rng).reshape(-1)
        for _ in range(B)])
    sid[:, -NCHW_CHUNK // 4:] = S_img  # trailing dummy stretch (pad pixels)
    gsid = np.where(sid >= S_img, S,
                    sid + np.arange(B)[:, None] * S_img).reshape(-1)

    temp = 0.5  # exactly-representable (see dbl-sweep test above)
    mx, pix = scatter_softmax_max_nchw(
        jnp.asarray(lg), jnp.asarray(gsid.reshape(B, 1, HW)), temp, S,
        interpret=True, dbl=6)
    rows = jnp.asarray(np.swapaxes(lg, 1, 2).reshape(B * HW, C))
    probs = jax.nn.softmax(rows / temp, axis=-1)
    want_mx, want_pix = seg_max_argmax(
        seg_context(jnp.asarray(gsid), S), probs, fill=0.0)
    np.testing.assert_array_equal(np.asarray(pix), np.asarray(want_pix))
    np.testing.assert_allclose(np.asarray(mx), np.asarray(want_mx),
                               rtol=1e-6)
