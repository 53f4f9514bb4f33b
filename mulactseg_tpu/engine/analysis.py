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
        # Only slice off / separately score the 'undefined' head when the
        # model actually has one (num_model_classes == C+1); VOC models
        # keep the plain C-class head (config.num_model_classes).
        has_undef_head = cfg.num_model_classes == cfg.num_classes + 1
        ignore_iou = None
        if argmax_mode and has_undef_head:
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
                cls_logits = logits[..., :-1] if has_undef_head else logits
                pred = np.asarray(jnp.argmax(cls_logits, -1))
                if ignore_iou is not None:
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


# ---------------------------------------------------------------------------
# Top-1 selection accuracy (active_joint_multi_analysis)
# ---------------------------------------------------------------------------

import functools

from mulactseg_tpu.ops.segment import scatter_max


@functools.partial(jax.jit, static_argnames=("nseg", "num_classes"))
def top1_selection_counts(logits, multihot, spx, spmask, gt, *,
                          nseg: int, num_classes: int):
    """Per-batch counts for the top-1 selection-accuracy probe
    (trainer/active_joint_multi_analysis.py:27-102).

    For every labeled superpixel s and every candidate class c in its
    multi-hot annotation, find the pixel with the highest softmax
    probability of c inside s; the probe asks whether the precise GT at
    that pixel equals c. The reference runs one python loop per image
    with torch_scatter; here one batched scatter_max per image via vmap.

    Returns (ncorr_cls, n_cls, ncorr_total, n_total): per-GT-class and
    total correct/attempt counts. Rows whose GT pixel is ignore (255)
    count in the totals as incorrect (matching `(gt == pred)`) but are
    dropped from the per-class bins — the reference would index
    ncorr_cls[255] and crash there, so the bins only ever see gt < C.
    """
    B, H, W, C = logits.shape
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).reshape(B, H * W, C)
    sid = spx.reshape(B, H * W).astype(jnp.int32)
    mask = spmask.reshape(B, H * W).astype(bool)
    gtf = gt.reshape(B, H * W).astype(jnp.int32)

    def one(p, s, m, g, mh):
        # masked scatter_max: invalid pixels routed to a dummy segment;
        # empty segments come back with argmax == P (torch_scatter
        # semantics, utils/loss.py:204)
        _, amax = scatter_max(p, s, nseg, mask=m, return_argmax=True)
        valid_seg = amax[:, 0] < p.shape[0]                 # (S,)
        gt_at = jnp.take(g, jnp.minimum(amax, g.shape[0] - 1))  # (S, C)
        want = mh[:, :num_classes].astype(bool) & valid_seg[:, None]
        correct = want & (gt_at == jnp.arange(C)[None, :])
        gtc = jnp.clip(gt_at, 0, num_classes)               # 255 -> bin C
        oh = jax.nn.one_hot(gtc, num_classes + 1, dtype=jnp.float32)
        n_cls = (oh * want[..., None]).sum((0, 1))[:num_classes]
        ncorr_cls = (oh * correct[..., None]).sum((0, 1))[:num_classes]
        return ncorr_cls, n_cls, correct.sum(), want.sum()

    ncorr_cls, n_cls, ncorr, n = jax.vmap(one)(probs, sid, mask, gtf,
                                               multihot.astype(jnp.float32))
    return (ncorr_cls.sum(0), n_cls.sum(0),
            ncorr.sum().astype(jnp.float32), n.sum().astype(jnp.float32))


class SelectionAccuracyEvaluator:
    """active_joint_multi_analysis: top-1 selection accuracy over the
    *labeled* train set (trainer/active_joint_multi_analysis.py:27-102).
    train_impl is NotImplementedError upstream — this trainer only
    evaluates."""

    def __init__(self, model, cfg):
        self.model = model
        self.cfg = cfg
        self._fwd = jax.jit(
            lambda p, bs, x: model.apply({"params": p, "batch_stats": bs},
                                         x, train=False))

    def run(self, params, batch_stats, loader: Iterable,
            *, selection_iter: int = 0, logger=None) -> Dict:
        cfg = self.cfg
        ncorr_cls = np.zeros(cfg.num_classes)
        n_cls = np.zeros(cfg.num_classes)
        ncorr_total = 0.0
        n_total = 0.0
        for batch in loader:
            logits = self._fwd(params, batch_stats,
                               jnp.asarray(batch["images"]))
            cc, nc, ct, nt = top1_selection_counts(
                logits, jnp.asarray(batch["target"]),
                jnp.asarray(batch["spx"]), jnp.asarray(batch["spmask"]),
                jnp.asarray(batch["labels"]),
                nseg=cfg.nseg, num_classes=cfg.num_classes)
            ncorr_cls += np.asarray(cc)
            n_cls += np.asarray(nc)
            ncorr_total += float(ct)
            n_total += float(nt)
        acc_total = ncorr_total / max(n_total, 1.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            acc_cls = ncorr_cls / n_cls
        acc_table = ",".join(str(a) for a in acc_cls.tolist())
        msg = "[AL {}-round]: evaluation\n{},{}".format(
            selection_iter, acc_total, acc_table)
        if logger is not None:
            logger.info(msg)
        else:
            print(msg, flush=True)
        return {"acc_total": acc_total, "acc_cls": acc_cls,
                "n_cls": n_cls, "n_total": n_total}
