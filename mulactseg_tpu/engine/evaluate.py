"""Evaluation loops with on-device streaming mIoU.

Covers the reference's inference paths: plain argmax eval
(trainer/base.py:138-175), predignore eval reporting mIoU over the C real
classes plus a separate undefined-class IoU
(trainer/active_joint_multi_predignore.py:175-216 / eval_naive.py).
"""

from __future__ import annotations

from typing import Iterable, Optional

import jax.numpy as jnp
import numpy as np

from mulactseg_tpu.engine.train import make_eval_step
from mulactseg_tpu.utils.metrics import IoUIgnore, MeanIoU


class Evaluator:
    def __init__(self, model, cfg):
        self.model = model
        self.cfg = cfg
        self.step = make_eval_step(model)
        self._sliding = None
        if getattr(cfg, "sliding_eval", False):
            from mulactseg_tpu.engine.sliding import SlidingEval

            # sliding eval sums logits over the crop grid and evaluates
            # the first num_classes channels (trainer/eval_slide.py:17-88)
            self._sliding = SlidingEval(model, cfg.num_classes,
                                        crop_size=cfg.slide_crop,
                                        stride_rate=cfg.slide_stride_rate)

    def run(self, params, batch_stats, loader: Iterable, *,
            predignore: Optional[bool] = None, mesh=None):
        """loader yields dicts with 'images' (B,H,W,3 normalized float) and
        'labels' (B,H,W int). Returns (miou, iou_table_str) like
        trainer/base.py:161-175.

        mesh: optional device mesh — full-resolution eval images are then
        SPATIALLY sharded (height axis) across the chips and GSPMD inserts
        the conv halo exchanges; this is how batch-1 Cityscapes val
        (1024x2048) scales past one chip."""
        cfg = self.cfg
        if predignore is None:
            predignore = "predignore" in cfg.method
        if self._sliding is not None:
            predignore = False  # sliding path slices channels to C already
        iou = MeanIoU(cfg.num_classes, cfg.ignore_idx)
        ign = IoUIgnore(cfg.num_classes, cfg.ignore_idx) if predignore else None
        for batch in loader:
            images = jnp.asarray(batch["images"])
            if mesh is not None and mesh.size > 1 and self._sliding is None:
                from mulactseg_tpu.parallel.mesh import shard_spatial

                images = shard_spatial(images, mesh)
            if self._sliding is not None:
                logits = self._sliding(params, batch_stats,
                                       jnp.asarray(batch["images"]))
            else:
                logits = self.step(params, batch_stats, images)
            labels = jnp.asarray(batch["labels"])
            if predignore:
                preds_real = jnp.argmax(logits[..., :-1], axis=-1)
                preds_full = jnp.argmax(logits, axis=-1)
                iou._after_step({"outputs": preds_real, "targets": labels})
                ign._after_step({"outputs": preds_full, "targets": labels})
            else:
                preds = jnp.argmax(logits, axis=-1)
                iou._after_step({"outputs": preds, "targets": labels})
        ious = iou._after_epoch()
        miou = float(np.mean(ious))
        table = [f"{miou:.2f}"] + [f"{v:.2f}" for v in ious]
        if ign is not None:
            table.append(f"{ign._after_epoch():.2f}")
        return miou, ",".join(table)
