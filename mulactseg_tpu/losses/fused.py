"""Fused stage-1 lossdecomp over per-pixel target bitmasks.

Semantically identical to losses/partial.lossdecomp (the shipped stage-1
loss, trainer/active_joint_multi_predignore_lossdecomp.py:74-117) but
built for the TPU memory system:

  * the loader packs each pixel's candidate multi-hot as a <=32-bit int
    (`target_bits`, 0 where the superpixel is unselected) — so the CE and
    MC terms become ONE fused elementwise pass over the logits with no
    per-pixel gather from the (S, C) annotation table (those row gathers
    are latency-bound on TPU: ~26 ms/step at stage-1 shapes);
  * the group (MIL) term runs through ops.segment.segment_softmax_max:
    sorted-run Pallas kernel with the softmax computed in-register and a
    sparse scatter backward — the (B, P, C) probability tensor never
    exists in HBM.

`pixel_target_bits` is the loader-side packer (numpy) and
`pixel_target_bits_jnp` the device fallback for callers that only have
(S, C) targets + spx + spmask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mulactseg_tpu.ops.segment import segment_softmax_max_nchw

EPS = 1e-8


def pixel_target_bits(target: np.ndarray, spx: np.ndarray,
                      spmask: np.ndarray) -> np.ndarray:
    """Loader-side packer: (S, C<=32) multi-hot + (H, W) spx + (H, W)
    selected-mask -> (H, W) int32 candidate bitmask (0 = invalid pixel)."""
    C = target.shape[-1]
    assert C <= 31, C
    weights = (1 << np.arange(C, dtype=np.int64))
    seg_bits = ((target > 0.5).astype(np.int64) * weights).sum(-1)
    # crop padding writes nseg into the spx map (transform.py:62 pad
    # convention); those pixels are never selected, so clip the lookup
    # and let the spmask zero them
    from mulactseg_tpu import native

    if (native.lib() is not None and spx.dtype == np.int32
            and spmask.dtype == np.bool_):
        # identical clip+gather+gate, one GIL-released C pass
        return native.bits_lookup(spx, spmask, seg_bits)
    spx_c = np.minimum(spx, seg_bits.shape[0] - 1)
    return (seg_bits[spx_c] * spmask).astype(np.int32)


def pixel_target_bits_jnp(target, spx, spmask):
    """Device fallback of pixel_target_bits ((B,S,C),(B,H,W),(B,H,W))."""
    C = target.shape[-1]
    weights = (1 << jnp.arange(C, dtype=jnp.int32))
    seg_bits = jnp.sum((target > 0.5).astype(jnp.int32) * weights, axis=-1)
    B = spx.shape[0]
    flat = jnp.take_along_axis(seg_bits, spx.reshape(B, -1), axis=1)
    return jnp.where(spmask.reshape(B, -1), flat, 0).reshape(spx.shape)


def bits_to_multihot(bits, num_classes):
    """(..., ) int32 -> (..., C) f32 candidate indicator."""
    shifts = jnp.arange(num_classes, dtype=jnp.int32)
    return ((bits[..., None] >> shifts) & 1).astype(jnp.float32)


def lossdecomp_fused(logits, target_bits, targets, spx, *, nseg,
                     coeff=16.0, coeff_mc=8.0, coeff_gm=1.0,
                     multi_ce_temp=0.1, group_ce_temp=0.1, nchw=False):
    """coeff*CE(one-hot spx) + coeff_mc*MC(multi-hot spx) +
    coeff_gm*Group(multi-hot spx), normalizers 1 + count, exactly as
    losses/partial.lossdecomp. Returns (total, aux).

    nchw=True: logits arrive (B, C, H, W) straight from the model
    (DeepLabV3 nchw_logits) — no full-res layout change in the loss
    (measured perf-neutral on the current chip, see DeepLabV3)."""
    from mulactseg_tpu.ops.pixel_loss_pallas import (
        CHUNK,
        pixel_partial_ce_nchw,
    )

    if nchw:
        B, C, H, W = logits.shape
    else:
        B, H, W, C = logits.shape

    # --- CE + MC terms: one streaming Pallas pass over the logits ---------
    # channels-on-sublanes: reads the logits through their native NCHW
    # layout (no 20->128 lane padding — the row-major view costs a
    # ~190 MB relayout + 6.4x padded reads). Odd spatial sizes (VOC 513^2)
    # are zero-padded on the pixel axis to a CHUNK multiple: the pad
    # pixels carry bits 0 (invalid), so every sum/count is unchanged and
    # they land in the dummy segment bucket of the group term — exact, at
    # <=0.4% extra pixels instead of the row-major fallback's relayout.
    # Keep the model's dtype: the kernels cast to f32 in-register.
    lgc = (logits.reshape(B, C, H * W) if nchw
           else jnp.transpose(logits, (0, 3, 1, 2)).reshape(B, C, H * W))
    bits3 = target_bits.reshape(B, 1, H * W).astype(jnp.int32)
    spx_flat = spx.reshape(B, H * W)
    rem = (H * W) % CHUNK
    if rem:
        pad = CHUNK - rem
        lgc = jnp.pad(lgc, ((0, 0), (0, 0), (0, pad)))
        bits3 = jnp.pad(bits3, ((0, 0), (0, 0), (0, pad)))
        spx_flat = jnp.pad(spx_flat, ((0, 0), (0, pad)))
    HWp = lgc.shape[-1]
    oh_sum, oh_cnt, mh_sum, mh_cnt = pixel_partial_ce_nchw(
        lgc, bits3, multi_ce_temp)
    ce = oh_sum / (1.0 + oh_cnt)
    mc = mh_sum / (1.0 + mh_cnt)

    # --- group term: multi-hot pixels feed a per-(segment, class) max -----
    # batch folded into the segment axis (sid + b*nseg) so the whole batch
    # is ONE sort/gather/kernel and the backward scatter is un-vmapped
    # (vmapped scatters serialize into while loops on TPU)
    # candidate count via popcount on the low C bits — no (N, C)
    # bit-expansion intermediate (lane-padded (N, 20) i32 costs real HBM)
    P = B * HWp
    mh_pix = jax.lax.population_count(
        bits3.reshape(P) & jnp.int32((1 << C) - 1)) > 1
    off = jnp.repeat(jnp.arange(B, dtype=jnp.int32) * nseg, HWp)
    sid = jnp.where(mh_pix, spx_flat.reshape(P) + off, B * nseg)
    # NCHW path: softmax + raster-block pre-reduction + lane pad in
    # one kernel pass over the native layout; the sorted gather then
    # touches ~4x fewer rows (ops/segment.segment_softmax_max_nchw)
    mx, pix = segment_softmax_max_nchw(lgc, sid, B * nseg,
                                       group_ce_temp)
    mx = mx.reshape(B, nseg, C)
    present = (pix[:, 0] < P).reshape(B, nseg)
    entry = (targets > 0.5) & present[:, :, None]
    gnll = -jnp.log(mx + EPS)
    group = jnp.sum(jnp.where(entry, gnll, 0.0)) / (1.0 + jnp.sum(entry))

    total = coeff * ce + coeff_mc * mc + coeff_gm * group
    return total, {"ce_loss": ce, "mc_loss": mc, "group_loss": group,
                   "train_loss": total}
