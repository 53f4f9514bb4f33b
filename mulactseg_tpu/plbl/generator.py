"""Pseudo-label generation driver (the eval_AL --method eval_save_*
equivalents).

Walks the labeled set at full resolution, runs feat_forward (optionally
10-view TTA), generates the chosen pseudo-label type, saves PNGs under
<save_root>/plbl_gen[_<type>]/round_<k>/ (path convention of
trainer/eval_save_cosplbl_prop.py:35-44) and streams C+1-class
IoU/precision/recall against the precise GT (:88-117).
"""

from __future__ import annotations

import os
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from mulactseg_tpu.engine.tta import tta_feat_forward
from mulactseg_tpu.plbl.cosine_prop import (
    cosine_prototype_plbl,
    selected_spx_adjacency,
)
from mulactseg_tpu.plbl.simple import naive_argmax_plbl, within_multihot_plbl
from mulactseg_tpu.utils.metrics import MeanIoU

PLBL_TYPES = ("cosprop", "cosprop_includeonehot", "naive_argmax",
              "within_multihot", "cos_withinspx",
              "cos_withinspx_includeonehot")


class PseudoLabelGenerator:
    def __init__(self, model, cfg, plbl_type: str = "cosprop_includeonehot",
                 use_tta: bool = False, max_protos: int = 1024):
        if plbl_type not in PLBL_TYPES:
            raise KeyError(f"unknown plbl type {plbl_type!r}; have {PLBL_TYPES}")
        self.model = model
        self.cfg = cfg
        self.plbl_type = plbl_type
        self.use_tta = use_tta
        self.max_protos = max_protos
        self._feat_step = jax.jit(
            lambda p, bs, x: model.apply({"params": p, "batch_stats": bs}, x,
                                         train=False, return_feat=True))

    def _forward(self, params, batch_stats, images):
        if self.use_tta:
            return tta_feat_forward(self.model, params, batch_stats, images)
        return self._feat_step(params, batch_stats, images)

    def generate(self, params, batch_stats, loader: Iterable, *,
                 save_dir: Optional[str] = None, suppix: Optional[dict] = None):
        """loader yields single-image batches with images/labels/target/
        spx/spmask/fnames (the eval_region_*_all contract). `suppix` maps
        spx path -> selected superpixel ids (the active set's labeled
        dict). Returns (miou, iou_table, precision_table, recall_table)."""
        cfg = self.cfg
        include_onehot = self.plbl_type.endswith("includeonehot")
        propagate = self.plbl_type.startswith("cosprop")
        iou = MeanIoU(cfg.num_classes + 1, cfg.ignore_idx)
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)

        for batch in loader:
            images = jnp.asarray(batch["images"])
            labels = np.asarray(batch["labels"])
            spx_map = np.asarray(batch["spx"][0])
            spmask = np.asarray(batch["spmask"][0]).astype(bool)
            targets = np.asarray(batch["target"][0], np.float32)
            H, W = spx_map.shape

            if self.plbl_type == "within_multihot":
                logits = self.model.apply(
                    {"params": params, "batch_stats": batch_stats}, images,
                    train=False)
                plbl = within_multihot_plbl(
                    logits, jnp.asarray(targets)[None], jnp.asarray(spx_map)[None],
                    jnp.asarray(spmask)[None])[0]
            elif self.plbl_type == "naive_argmax":
                logits = self.model.apply(
                    {"params": params, "batch_stats": batch_stats}, images,
                    train=False)
                plbl = naive_argmax_plbl(logits, jnp.asarray(spmask)[None],
                                         num_real_classes=logits.shape[-1])[0]
            else:
                feat, logits = self._forward(params, batch_stats, images)
                probs = jax.nn.softmax(logits[0].astype(jnp.float32), axis=-1)
                fname = batch["fnames"][0][2]
                selected = (suppix or {}).get(fname, [])
                proto_sid, proto_cls, proto_valid, proto_adj = \
                    selected_spx_adjacency(spx_map, selected, cfg.nseg,
                                           targets, self.max_protos,
                                           include_onehot)
                pixel_valid = spmask.reshape(-1).copy()
                if not include_onehot:
                    multi = targets.sum(1) > 1
                    pixel_valid &= multi[np.clip(spx_map.reshape(-1), 0,
                                                 cfg.nseg - 1)]
                plbl = cosine_prototype_plbl(
                    feat[0].reshape(-1, feat.shape[-1]),
                    probs.reshape(-1, probs.shape[-1]),
                    jnp.asarray(spx_map.reshape(-1)),
                    jnp.asarray(pixel_valid),
                    jnp.asarray(proto_sid), jnp.asarray(proto_cls),
                    jnp.asarray(proto_valid), jnp.asarray(proto_adj),
                    nseg=cfg.nseg,
                    threshold_median=cfg.cosprop_threshold_method == "median",
                    propagate=propagate,
                ).reshape(H, W)

            plbl_np = np.asarray(plbl).astype(np.uint8)
            iou._after_step({"outputs": plbl_np[None],
                             "targets": labels})
            if save_dir:
                lbl_id = os.path.basename(batch["fnames"][0][1]).split(".")[0]
                Image.fromarray(plbl_np).save(
                    os.path.join(save_dir, f"{lbl_id}.png"))

        ious, precs, recs = iou._after_epoch_ipr()
        miou = float(np.mean(ious))
        fmt = lambda xs: ",".join([f"{np.mean(xs):.2f}"] +
                                  [f"{v:.2f}" for v in xs])
        return miou, fmt(ious), fmt(precs), fmt(recs)


def plbl_save_dir(checkpoint_path: str, plbl_type: Optional[str],
                  round_id: str) -> str:
    """Reproduces the reference's directory convention
    (eval_save_cosplbl_prop.py:35-44)."""
    d = os.path.dirname(checkpoint_path)
    if plbl_type:
        return os.path.join(d, f"plbl_gen_{plbl_type}", f"round_{round_id}")
    return os.path.join(d, "plbl_gen", f"round_{round_id}")
