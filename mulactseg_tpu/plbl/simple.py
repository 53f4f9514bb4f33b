"""Simple pseudo-label generators.

within_multihot_plbl: top-1 class *within the candidate set* for every
pixel of a selected superpixel (trainer/eval_within_multihot.py:95-146 —
note the reference applies the candidate mask to raw logits, not
softmax; we reproduce that, including its quirk that a pixel whose
candidate logits are all negative can fall back to a zero-masked
non-candidate).

naive_argmax_plbl: plain argmax over the real classes inside selected
superpixels (the --plbl_type naive_argmax family,
trainer/eval_save_cosplbl_naive_voc.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("ignore_value",))
def within_multihot_plbl(logits, targets, spx, spmask, ignore_value=255):
    """logits (B,H,W,C); targets (B,S,C); spx/spmask (B,H,W).
    Returns (B,H,W) int32 pseudo labels, `ignore_value` outside spmask."""
    B, H, W, C = logits.shape
    lg = logits.reshape(B, H * W, C)
    spxf = spx.reshape(B, H * W).astype(jnp.int32)
    mask = spmask.reshape(B, H * W).astype(bool)
    trg_pixel = jnp.take_along_axis(targets.astype(lg.dtype),
                                    spxf[:, :, None], axis=1)
    masked = lg * trg_pixel
    plbl = jnp.argmax(masked, axis=-1).astype(jnp.int32)
    out = jnp.where(mask, plbl, ignore_value)
    return out.reshape(B, H, W)


@functools.partial(jax.jit, static_argnames=("num_real_classes", "ignore_value"))
def naive_argmax_plbl(logits, spmask, *, num_real_classes, ignore_value=255):
    """Argmax over the first num_real_classes channels inside spmask."""
    B, H, W, C = logits.shape
    plbl = jnp.argmax(logits[..., :num_real_classes], axis=-1).astype(jnp.int32)
    return jnp.where(spmask.astype(bool), plbl, ignore_value)


@functools.partial(jax.jit, static_argnames=("ignore_value",))
def naive_threshold_plbl(logits, spmask, *, plbl_th=0.0, ignore_value=255):
    """eval_save_naiveplbl semantics (trainer/eval_save_naiveplbl.py:50-56):
    top-1 over ALL model channels; with plbl_th > 0 the mask is replaced by
    a (no-temperature) softmax-confidence threshold over the whole image."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if plbl_th > 0:
        mask = jnp.max(probs, axis=-1) > plbl_th
    else:
        mask = spmask.astype(bool)
    plbl = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jnp.where(mask, plbl, ignore_value)


@jax.jit
def naive_threshold_fill(plbl, logits, spmask, *, temp, plbl_th):
    """The *_prop / *_naiveprop fill step (eval_save_candidateplbl_prop.py:
    48-60, eval_save_cosplbl_naiveprop.py:57-67): pixels OUTSIDE spmask
    whose temperature-softmax top-1 confidence passes plbl_th take the
    predicted class, overwriting the incoming pseudo label."""
    probs = jax.nn.softmax(logits.astype(jnp.float32) / temp, axis=-1)
    conf = jnp.max(probs, axis=-1)
    cls = jnp.argmax(probs, axis=-1).astype(plbl.dtype)
    fill = (conf > plbl_th) & ~spmask.astype(bool)
    return jnp.where(fill, cls, plbl)
