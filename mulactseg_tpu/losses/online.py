"""Online prototype pseudo-label losses (stage-1 online variants).

LocalProtoCE (trainer/active_onlineplbl_multi_predignore.py:14-141): at
every step an eval-mode feat_forward produces features; within each
multi-hot superpixel, per-(spx, class) argmax pixels become prototypes,
every valid pixel takes the class of its nearest (cosine) own-spx
prototype, and a CE (temp, ignore 255) against these online pseudo
labels is added with a ramped weight
(active_onlineplbl_multi_predignore.py:179-182).

The weighted variants scale each pixel's CE by a detached weight:
similarity to the assigned prototype for active_onlinesimwplbl_*
(:120 of the simw trainer) or the eval-forward's softmax probability at
the pseudo-label class for active_onlinewplbl(only)_*
(active_onlinewplbl_multi_predignore.py:119) — source chosen per method
in engine/train._online_plbl_loss.

Prototypes are compacted into NP static slots (jnp.nonzero with a static
size) and similarities run as chunked (pixels x prototypes) matmuls on
the MXU — the same structure as plbl/cosine_prop.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mulactseg_tpu.ops.segment import segment_max_grad

EPS = 1e-8
NEG = -1e30


@functools.partial(jax.jit, static_argnames=("nseg", "max_protos", "chunk",
                                             "ignore_value"))
def local_proto_plbl(feats, probs, targets, spx, spmask, *, nseg,
                     max_protos=256, chunk=65536, ignore_value=255):
    """Per-image online pseudo labels + similarities.

    feats (P, Ch) normalized; probs (P, C); targets (S, C); spx (P,);
    spmask (P,). Returns (plbl (P,) int32 with ignore_value outside
    multi-hot selected spxs, sim (P,) cosine similarity to the assigned
    prototype (0 where unassigned), is_proto_src (P,) bool marking the
    prototype source pixels).
    """
    P, Ch = feats.shape
    C = probs.shape[-1]
    spx = spx.astype(jnp.int32)
    is_multi = jnp.sum(targets, axis=-1) > 1  # (S,)
    pix_multi = jnp.take(is_multi, jnp.clip(spx, 0, nseg - 1))
    valid = spmask.astype(bool).reshape(-1) & pix_multi
    sid = jnp.where(valid, spx, nseg)
    _, argpix = segment_max_grad(probs.astype(jnp.float32), sid, nseg)

    proto_exists = (targets > 0.5) & (argpix < P) & is_multi[:, None]
    (flat_idx,) = jnp.nonzero(proto_exists.reshape(-1), size=max_protos,
                              fill_value=nseg * C)
    proto_sid = jnp.where(flat_idx < nseg * C, flat_idx // C, nseg)
    proto_cls = (flat_idx % C).astype(jnp.int32)
    src = jnp.take(argpix.reshape(-1), jnp.clip(flat_idx, 0, nseg * C - 1))
    proto_ok = flat_idx < nseg * C
    pf = jnp.take(feats.astype(jnp.float32), jnp.clip(src, 0, P - 1), axis=0)
    pf = jnp.where(proto_ok[:, None], pf, 0.0)  # (NP, Ch)

    pad = (-P) % chunk
    feats_p = jnp.pad(feats.astype(jnp.float32), ((0, pad), (0, 0)))
    spx_p = jnp.pad(spx, (0, pad), constant_values=0)

    def body(carry, xs):
        cf, cs = xs
        sim = cf @ pf.T  # (T, NP) on the MXU
        own = (proto_sid[None, :] == cs[:, None]) & proto_ok[None, :]
        s_own = jnp.where(own, sim, NEG)
        best = jnp.max(s_own, axis=-1)
        j = jnp.argmax(s_own, axis=-1)
        return carry, (jnp.take(proto_cls, j), best)

    _, (cls, best) = jax.lax.scan(
        body, 0, (feats_p.reshape(-1, chunk, Ch), spx_p.reshape(-1, chunk)))
    cls = cls.reshape(-1)[:P]
    best = best.reshape(-1)[:P]
    has = valid & (best > NEG / 2)
    plbl = jnp.where(has, cls, ignore_value).astype(jnp.int32)
    # prototype-source pixels: the per-(spx, class) argmax pixels that
    # became prototypes (weight_wo_proto forces their weight to 1.0,
    # active_onlinewplbl_multi_predignore.py:120-121)
    src_safe = jnp.where(proto_ok, src, P)
    is_proto_src = jnp.zeros((P,), bool).at[src_safe].set(
        True, mode="drop")
    return plbl, jnp.where(has, best, 0.0), is_proto_src


@functools.partial(jax.jit, static_argnames=("nseg", "max_protos", "chunk"))
def prototype_weight_targets(feats, probs_plbl, targets, spx, spmask, *,
                             nseg, simw_temp=1.0, max_protos=256,
                             chunk=65536):
    """JointLocalProtoWeightingCE weight construction
    (trainer/active_pwce_multi_predignore.py:30-146): for pixels of
    multi-hot superpixels, each candidate class's target entry is replaced
    by the softmax (over the superpixel's prototypes, temperature
    simw_temp) of the pixel's cosine similarity to that class's prototype;
    one-hot rows keep weight 1. Returns (P, C) float weights (zero rows
    for invalid pixels are handled by the caller's spmask)."""
    P, Ch = feats.shape
    C = probs_plbl.shape[-1]
    spx = spx.astype(jnp.int32)
    spmask = spmask.astype(bool).reshape(-1)
    trg_pixel = jnp.take(targets.astype(jnp.float32),
                         jnp.clip(spx, 0, nseg - 1), axis=0)  # (P, C)
    is_multi_row = jnp.sum(targets, axis=-1) > 1
    pix_multi = jnp.take(is_multi_row, jnp.clip(spx, 0, nseg - 1))
    valid = spmask & pix_multi
    sid = jnp.where(valid, spx, nseg)
    _, argpix = segment_max_grad(probs_plbl.astype(jnp.float32), sid, nseg)

    proto_exists = (targets > 0.5) & (argpix < P) & is_multi_row[:, None]
    (flat_idx,) = jnp.nonzero(proto_exists.reshape(-1), size=max_protos,
                              fill_value=nseg * C)
    proto_sid = jnp.where(flat_idx < nseg * C, flat_idx // C, nseg)
    proto_cls = (flat_idx % C).astype(jnp.int32)
    src = jnp.take(argpix.reshape(-1), jnp.clip(flat_idx, 0, nseg * C - 1))
    proto_ok = flat_idx < nseg * C
    pf = jnp.take(feats.astype(jnp.float32), jnp.clip(src, 0, P - 1), axis=0)
    pf = jnp.where(proto_ok[:, None], pf, 0.0)

    pad = (-P) % chunk
    feats_p = jnp.pad(feats.astype(jnp.float32), ((0, pad), (0, 0)))
    spx_p = jnp.pad(spx, (0, pad), constant_values=0)
    oh_cls = jax.nn.one_hot(proto_cls, C, dtype=jnp.float32)  # (NP, C)

    def body(carry, xs):
        cf, cs = xs
        sim = cf @ pf.T  # (T, NP)
        own = (proto_sid[None, :] == cs[:, None]) & proto_ok[None, :]
        s = jnp.where(own, sim / simw_temp, NEG)
        w = jax.nn.softmax(s, axis=-1)
        w = jnp.where(own, w, 0.0)
        # distribute prototype weights onto their classes
        return carry, w @ oh_cls  # (T, C)

    _, wcls = jax.lax.scan(
        body, 0, (feats_p.reshape(-1, chunk, Ch), spx_p.reshape(-1, chunk)))
    wcls = wcls.reshape(-1, C)[:P]
    weights = jnp.where(valid[:, None], wcls * trg_pixel, trg_pixel)
    return jax.lax.stop_gradient(weights)


def prototype_weighted_ce(logits, weights, spmask, *, temp=1.0):
    """The pwce loss body (active_pwce_multi_predignore.py:141-155):
    sum over spmask pixels of sum_c w_{p,c} * -log softmax_c, normalized
    by 1 + #valid pixels; returns 0 when no pixel contributes."""
    B = logits.shape[0]
    C = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32) / temp, axis=-1)
    probs = probs.reshape(-1, C)
    m = spmask.reshape(-1).astype(bool)
    nll = -jnp.log(probs + EPS)
    per_pix = jnp.sum(weights.reshape(-1, C) * nll, axis=-1)
    loss = jnp.sum(jnp.where(m, per_pix, 0.0))
    num = 1.0 + jnp.sum(m)
    out = loss / num
    return jnp.where(jnp.isfinite(out), out, 0.0)


def local_proto_ce(logits, plbl, *, temp=1.0, ignore_value=255, weights=None):
    """CE between predictions and online pseudo labels; NaN (no valid
    pixel) collapses to 0 like the reference's guard (:138-139)."""
    lg = logits.astype(jnp.float32) / temp
    valid = plbl != ignore_value
    safe = jnp.where(valid, plbl, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(lg, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    if weights is not None:
        nll = nll * jax.lax.stop_gradient(weights)
    loss = jnp.sum(jnp.where(valid, nll, 0.0))
    n = jnp.sum(valid)
    return jnp.where(n > 0, loss / jnp.maximum(n, 1), 0.0)
