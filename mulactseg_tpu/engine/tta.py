"""Multi-scale + flip test-time augmentation.

The reference builds 10 views host-side (5 scales x flip,
dataloader/ext_transforms.py:18-46) and averages features/logits after
resizing back (trainer/eval_save_cosplbl_prop_includeonehot_voc_ms.py:53-80).
Here each view is resized, forwarded and un-flipped on device; averaged
feats are re-normalized like the reference.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

TTA_SCALES = (0.5, 0.75, 1.0, 1.25, 1.5)


def _resize(x, H, W):
    B = x.shape[0]
    C = x.shape[-1]
    return jax.image.resize(x, (B, H, W, C), method="bilinear",
                            antialias=False)


def tta_feat_forward(model, params, batch_stats, images,
                     scales: Sequence[float] = None):
    """images (B,H,W,3). Returns (feat (B,H,W,Ch) re-normalized,
    logits (B,H,W,C)) averaged over scales x flips. scales=None reads
    the module-level TTA_SCALES at call time (tests shrink it — each
    scale is a distinct compile)."""
    if scales is None:
        scales = TTA_SCALES
    B, H, W, _ = images.shape
    feat_sum = None
    logit_sum = None
    n = 0
    for flip in (False, True):
        for s in scales:
            h, w = int(s * H), int(s * W)
            img = _resize(images, h, w)
            if flip:
                img = img[:, :, ::-1, :]
            feat, logits = model.apply(
                {"params": params, "batch_stats": batch_stats}, img,
                train=False, return_feat=True)
            if flip:
                feat = feat[:, :, ::-1, :]
                logits = logits[:, :, ::-1, :]
            feat = _resize(feat, H, W)
            logits = _resize(logits, H, W)
            feat_sum = feat if feat_sum is None else feat_sum + feat
            logit_sum = logits if logit_sum is None else logit_sum + logits
            n += 1
    feat = feat_sum / n
    feat = feat / jnp.sqrt(jnp.sum(jnp.square(feat), axis=-1,
                                   keepdims=True) + 1e-12)
    return feat, logit_sum / n
