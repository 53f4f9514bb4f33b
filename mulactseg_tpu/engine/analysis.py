"""Analysis-only evaluation trainers (the reference's eval_* files that
measure intermediate-artifact quality instead of saving pseudo labels).

Method map (each row cites its reference file in /root/reference/trainer):

  eval_cosplbl_within_multihot        within-spx nearest-prototype plbl,
                                      IoU + precision/recall
                                      (eval_cosplbl_within_multihot.py)
  eval_ensemble_plbl_within_multihot  same plbl, IoU only
                                      (eval_ensemble_plbl_within_multihot.py
                                      — its pseudo_label_generation is the
                                      same within-spx algorithm)
  eval_maxcosplbl_within_multihot     same plbl; also logs how many pixels
                                      prefer the global (classifier) over
                                      the local prototype
                                      (eval_maxcosplbl_within_multihot.py:169)
  eval_cosplbl_filt_within_multihot   plbl kept only where the model's
                                      argmax agrees; prototype pixels keep
                                      their class
                                      (eval_cosplbl_filt_within_multihot.py:161-169)
  eval_within_multihot(_voc)          top-1-within-candidate-set plbl
                                      (eval_within_multihot.py:93-146)
  eval_all_cosplbl_prop               propagated cosine plbl, evaluated
                                      only within the predicted region +
                                      precision/recall
                                      (eval_all_cosplbl_prop.py:54)
  eval_all_dominant                   the dominant-label annotation itself
                                      as the prediction (no model forward)
                                      (eval_all_dominant.py:40-48)
  eval_naive_vis                      plain C-class eval + decoded
                                      prediction/GT PNG dumps
                                      (eval_naive_vis.py:60-87)
  eval_vistopone_within_multihot      within-spx plbl + 4-panel boundary
                                      visualizations
                                      (eval_vistopone_within_multihot.py:60-106)
  eval_selected_spx_plbl              like vistopone, minus round-1
                                      selections
                                      (eval_selected_spx_plbl.py:40-57)
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from mulactseg_tpu.plbl.generator import PseudoLabelGenerator
from mulactseg_tpu.utils.metrics import MeanIoU

# method -> (plbl type for PseudoLabelGenerator, options)
ANALYSIS_METHODS: Dict[str, Dict] = {
    "eval_cosplbl_within_multihot": {
        "plbl": "cos_withinspx_includeonehot", "ipr": True},
    "eval_ensemble_plbl_within_multihot": {
        "plbl": "cos_withinspx_includeonehot"},
    "eval_maxcosplbl_within_multihot": {
        "plbl": "cos_withinspx_includeonehot"},
    "eval_cosplbl_filt_within_multihot": {"plbl": "cosplbl_filtgt"},
    "eval_within_multihot": {"plbl": "within_multihot"},
    "eval_within_multihot_voc": {"plbl": "within_multihot"},
    "eval_all_cosplbl_prop": {
        "plbl": "cosprop", "ipr": True, "within_predregion": True},
    "eval_all_dominant": {"pred": "target", "ipr": True},
    "eval_naive_vis": {"pred": "argmax", "save_vis": True},
    "eval_vistopone_within_multihot": {
        "plbl": "cos_withinspx_includeonehot", "save_vis": True},
    "eval_selected_spx_plbl": {
        "plbl": "cos_withinspx_includeonehot", "save_vis": True,
        "exclude_round": 1},
}


def _fmt(xs):
    return ",".join([f"{np.mean(xs):.2f}"] + [f"{v:.2f}" for v in xs])


class AnalysisEvaluator:
    """Runs one analysis method over an eval_region_*_all-style loader.

    Returns a dict with 'miou', 'iou_table' and (when the method reports
    them) 'precision_table'/'recall_table'.
    """

    def __init__(self, model, cfg, method: str):
        if method not in ANALYSIS_METHODS:
            raise KeyError(f"unknown analysis method {method!r}; "
                           f"have {sorted(ANALYSIS_METHODS)}")
        self.model = model
        self.cfg = cfg
        self.method = method
        self.opts = ANALYSIS_METHODS[method]
        self.gen = None
        if "plbl" in self.opts:
            self.gen = PseudoLabelGenerator(model, cfg,
                                            plbl_type=self.opts["plbl"])
        self._eval_step = jax.jit(
            lambda p, bs, x: model.apply({"params": p, "batch_stats": bs},
                                         x, train=False))

    def _exclude_previous_round(self, suppix: dict, prev_suppix: dict):
        """eval_selected_spx_plbl.py:46-57: drop superpixels already
        selected in the earlier round so only fresh selections are shown."""
        out = {}
        for spx_path, ids in suppix.items():
            prev = set(prev_suppix.get(spx_path, []))
            kept = [i for i in ids if i not in prev]
            if kept:
                out[spx_path] = kept
        return out

    def run(self, params, batch_stats, loader: Iterable, *,
            suppix: Optional[dict] = None, prev_suppix: Optional[dict] = None,
            save_dir: Optional[str] = None, logger=None) -> Dict:
        cfg = self.cfg
        opts = self.opts
        if opts.get("exclude_round") and prev_suppix:
            suppix = self._exclude_previous_round(suppix or {}, prev_suppix)
        argmax_mode = opts.get("pred") == "argmax"
        # eval_naive_vis scores the C real classes + separate undefined IoU
        # (eval_naive_vis.py:47-48); plbl analyses use the C+1 metric
        iou = MeanIoU(cfg.num_classes if argmax_mode else cfg.num_classes + 1,
                      cfg.ignore_idx)
        ignore_iou = None
        if argmax_mode:
            from mulactseg_tpu.utils.metrics import IoUIgnore

            ignore_iou = IoUIgnore(cfg.num_classes, cfg.ignore_idx)
        if save_dir and (opts.get("save_vis") or cfg.save_vis):
            os.makedirs(save_dir, exist_ok=True)

        for batch in loader:
            labels = np.asarray(batch["labels"])
            if opts.get("pred") == "target":
                # the annotation itself is the prediction (eval_all_dominant)
                pred = np.asarray(batch["target"][0]).astype(np.int32)[None]
                spx_map = np.asarray(batch["spx"][0])
            elif argmax_mode:
                logits = self._eval_step(params, batch_stats,
                                         jnp.asarray(batch["images"]))
                # conventional IoU over the C real classes
                # (eval_naive_vis.py:70)
                pred = np.asarray(jnp.argmax(logits[..., :-1], -1))
                ignore_iou._after_step(
                    {"outputs": np.asarray(jnp.argmax(logits, -1)),
                     "targets": labels})
                spx_map = None
            else:
                plbl, spx_map = self.gen.plbl_for_batch(
                    params, batch_stats, batch, suppix)
                pred = np.asarray(plbl).astype(np.int32)[None]

            step = {"outputs": pred, "targets": labels}
            if opts.get("within_predregion"):
                iou._after_step_within_predregion(step)
            else:
                iou._after_step(step)

            if save_dir and (opts.get("save_vis") or cfg.save_vis):
                lbl_id = os.path.basename(
                    batch["fnames"][0][1]).split(".")[0]
                color = self.gen._decode(pred[0]) if self.gen else \
                    _decode(cfg, pred[0])
                if spx_map is not None:
                    from mulactseg_tpu.ops.morphology import boundary_mask

                    b = np.asarray(boundary_mask(jnp.asarray(spx_map)))
                    color[b.astype(bool)] = (255, 255, 0)
                Image.fromarray(color).save(
                    os.path.join(save_dir, f"{lbl_id}.png"))

        out: Dict = {}
        if opts.get("ipr"):
            ious, precs, recs = iou._after_epoch_ipr()
            out["precision_table"] = _fmt(precs)
            out["recall_table"] = _fmt(recs)
        else:
            ious = iou._after_epoch()
        out["miou"] = float(np.mean(ious))
        out["iou_table"] = _fmt(ious)
        if ignore_iou is not None:
            # appended undefined-class IoU (eval_naive_vis.py:95-98)
            out["ignore_iou"] = ignore_iou._after_epoch()
            out["iou_table"] += f",{out['ignore_iou']:.2f}"
        if logger is not None:
            logger.info("[%s] IoU: %s", self.method, out["iou_table"])
            for k in ("precision_table", "recall_table"):
                if k in out:
                    logger.info("[%s] %s: %s", self.method, k, out[k])
        return out


def _decode(cfg, pred: np.ndarray) -> np.ndarray:
    from mulactseg_tpu.data.constants import decode_cityscapes, voc_cmap

    filled = np.where(pred == 255, cfg.num_classes, pred)
    if cfg.dataset == "voc":
        return voc_cmap()[np.clip(filled, 0, 255)].astype(np.uint8)
    return decode_cityscapes(filled)
