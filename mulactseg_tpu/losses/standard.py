"""Dense-label losses: temperature CE (stage-2 retraining), focal loss,
and the RCCE pixel-map variants.

References: MyCrossEntropyLoss (/root/reference/utils/loss.py:10-21),
FocalLoss (:794-810), RCCE (:709-747), RCCE_asym (:749-792).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-8


def cross_entropy(logits, labels, *, temp=1.0, ignore_index=255):
    """Mean CE over non-ignored pixels with temperature.
    logits (B,H,W,C) float, labels (B,H,W) int."""
    C = logits.shape[-1]
    lg = logits.astype(jnp.float32) / temp
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(lg, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    loss = jnp.sum(jnp.where(valid, nll, 0.0))
    n = jnp.maximum(jnp.sum(valid), 1)
    return loss / n


def focal_loss(logits, labels, *, alpha=1.0, gamma=0.0, ignore_index=255,
               size_average=True):
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    pt = jnp.exp(-ce)
    fl = alpha * (1.0 - pt) ** gamma * ce
    fl = jnp.where(valid, fl, 0.0)
    if size_average:
        return jnp.sum(fl) / jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(fl)


def _rc_core(probs, probs_w, trg):
    """probs/probs_w (P,C); trg (P,C) in {0,1}. Weighted candidate sum then
    -log."""
    pos = probs * trg
    w = jax.lax.stop_gradient(probs_w * trg)
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), EPS)
    return -jnp.log(jnp.sum(w * pos, axis=-1) + EPS)


def rcce(logits, targets, *, temp=1.0):
    """RCCE over dense candidate maps: targets (B,H,W,C+1), last channel =
    ignore flag (utils/loss.py:709-747)."""
    B, H, W, C = logits.shape
    p = jax.nn.softmax(logits.astype(jnp.float32).reshape(-1, C) / temp, axis=-1)
    t = targets.reshape(-1, targets.shape[-1]).astype(jnp.float32)
    keep = t[:, -1] == 0
    trg = t[:, :-1]
    loss = _rc_core(p, p, trg)
    loss = jnp.where(keep, loss, 0.0)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(keep), 1)


def rcce_asym(logits, logits_w, targets, *, temp=1.0, temp_w=1.0):
    """Asymmetric RCCE: weights from a second (weak-view) prediction
    (utils/loss.py:749-792)."""
    B, H, W, C = logits.shape
    p = jax.nn.softmax(logits.astype(jnp.float32).reshape(-1, C) / temp, axis=-1)
    pw = jax.nn.softmax(logits_w.astype(jnp.float32).reshape(-1, C) / temp_w,
                        axis=-1)
    t = targets.reshape(-1, targets.shape[-1]).astype(jnp.float32)
    keep = t[:, -1] == 0
    loss = _rc_core(p, pw, t[:, :-1])
    loss = jnp.where(keep, loss, 0.0)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(keep), 1)
