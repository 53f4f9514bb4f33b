"""Sliding-window evaluation, fully on device.

Re-design of utils/sliding_evaluator.py:73-135 (crop 800, stride 2/3,
windows clamped to the padded image, logits summed over overlaps — the
reference accumulates a count map but never divides by it, and we keep
that behavior). The reference round-trips every crop through the CPU and
cv2; here the crop grid is a static python list per image shape, each
window is a lax.dynamic_slice, and accumulation happens in a scanned
dynamic_update_slice — one compiled program per image geometry.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _window_grid(H, W, crop, stride_rate):
    ch = cw = crop
    padH, padW = max(H, ch), max(W, cw)
    s = int(math.ceil(crop * stride_rate))
    rg = int(math.ceil((padH - ch) / s)) + 1
    cg = int(math.ceil((padW - cw) / s)) + 1
    pos = []
    for gy in range(rg):
        for gx in range(cg):
            ey = min(gy * s + ch, padH)
            ex = min(gx * s + cw, padW)
            pos.append((ey - ch, ex - cw))
    return padH, padW, pos


class SlidingEval:
    """Callable (params, batch_stats, images (B,H,W,3)) -> logits
    (B,H,W,C) with logits summed over the crop grid.

    With return_feat=True it is the utils/sliding_evaluator_plbl.py:16-29
    twin: the decoder's 256-d features are accumulated alongside the
    logits (both summed over windows) and the features are L2-renormalized
    at the end, returning (feat (B,H,W,Ch), logits (B,H,W,C)) — the inputs
    the cosine-prototype pseudo-label generator needs at full resolution.
    """

    def __init__(self, model, num_classes: int, crop_size: int = 800,
                 stride_rate: float = 2 / 3, return_feat: bool = False):
        self.model = model
        self.num_classes = num_classes
        self.crop = crop_size
        self.stride_rate = stride_rate
        self.return_feat = return_feat
        self._compiled = {}

    def _build(self, H: int, W: int):
        crop, C = self.crop, self.num_classes
        padH, padW, pos = _window_grid(H, W, crop, self.stride_rate)
        pos_arr = jnp.asarray(np.asarray(pos, np.int32))
        model = self.model
        return_feat = self.return_feat

        @jax.jit
        def run(params, batch_stats, images):
            B = images.shape[0]
            # center-pad to the window grid (pad_image_to_shape, value 0)
            ph, pw = padH - H, padW - W
            img = jnp.pad(images, ((0, 0), (ph // 2, ph - ph // 2),
                                   (pw // 2, pw - pw // 2), (0, 0)))

            def crop_out(sub):
                if return_feat:
                    feat, logits = model.apply(
                        {"params": params, "batch_stats": batch_stats},
                        sub, train=False, return_feat=True)
                    return jnp.concatenate(
                        [logits.astype(jnp.float32),
                         feat.astype(jnp.float32)], axis=-1)
                return model.apply({"params": params,
                                    "batch_stats": batch_stats},
                                   sub, train=False)[..., :C]

            if return_feat:
                _f, _l = jax.eval_shape(
                    lambda s: model.apply(
                        {"params": params, "batch_stats": batch_stats},
                        s, train=False, return_feat=True),
                    img[:, :crop, :crop])
                logits_ch = _l.shape[-1]
                Ch = _l.shape[-1] + _f.shape[-1]
            else:
                logits_ch, Ch = C, C
            acc0 = jnp.zeros((B, padH, padW, Ch), jnp.float32)

            def body(acc, yx):
                y, x = yx[0], yx[1]
                sub = jax.lax.dynamic_slice(
                    img, (0, y, x, 0), (B, crop, crop, 3))
                out = crop_out(sub)
                patch = jax.lax.dynamic_slice(acc, (0, y, x, 0),
                                              (B, crop, crop, Ch))
                acc = jax.lax.dynamic_update_slice(
                    acc, patch + out.astype(jnp.float32), (0, y, x, 0))
                return acc, None

            acc, _ = jax.lax.scan(body, acc0, pos_arr)
            acc = acc[:, ph // 2:ph // 2 + H, pw // 2:pw // 2 + W, :]
            if return_feat:
                logits = acc[..., :logits_ch]
                feat = acc[..., logits_ch:]
                feat = feat / jnp.maximum(
                    jnp.linalg.norm(feat, axis=-1, keepdims=True), 1e-12)
                return feat, logits
            return acc

        return run

    def __call__(self, params, batch_stats, images):
        H, W = images.shape[1:3]
        key = (H, W)
        if key not in self._compiled:
            self._compiled[key] = self._build(H, W)
        return self._compiled[key](params, batch_stats, images)
