"""Stat / visualization loaders — the reference's analysis one-offs
rebuilt as vectorized numpy over the shared histogram core:

  count_all        per-superpixel size + #distinct non-ignore GT classes
                   (region_cityscapes_count_all.py:25-52)
  visualize_minor  per-superpixel class composition: multi-hot incl. an
                   ignore column + per-class pixel counts
                   (region_cityscapes_visualize_minor.py:22-80)
  dom_w_gt         dominant-label training item that also carries the
                   precise GT map; 255 -> num_classes when the loaded
                   checkpoint is a predignore one
                   (region_cityscapes_dom_w_gt.py:44-85)
  dominant_sample  dominant labeling where each selected superpixel's
                   label is SAMPLED proportionally to class pixel counts
                   instead of argmax (region_cityscapes_dominant_all_
                   sample.py:41-52, torch.multinomial) — reproduced with
                   the Gumbel-max trick on log counts

The reference runs a per-superpixel Python loop with np.unique per
superpixel; here everything is one (S, C+1) histogram per image
(tools/label_assignment._hist) + array ops.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from mulactseg_tpu.tools.label_assignment import _hist, boundaries_thick


def superpixel_count_stats(gt: np.ndarray, spx: np.ndarray, nseg: int,
                           num_classes: int, selected: List[int],
                           ignore_idx: int = 255):
    """count_all semantics: (sup_size_bin, num_class_bin).

    sup_size_bin = pixel count per superpixel id present in the map (the
    reference's np.unique return_counts — ids ordered ascending);
    num_class_bin[k] = #distinct non-ignore GT classes inside
    selected[k] (0 when the superpixel is empty/all-ignore)."""
    flat_spx = spx.reshape(-1)
    flat_gt = gt.reshape(-1)
    sup_size_bin = np.unique(flat_spx, return_counts=True)[1]
    hist = _hist(flat_spx, flat_gt, nseg, num_classes, ignore_idx)
    n_cls = (hist[:, :num_classes] > 0).sum(-1)
    num_class_bin = np.zeros((nseg,), np.int64)
    sel = np.asarray(selected, np.int64)
    if sel.size:
        num_class_bin[:sel.size] = n_cls[sel]
    return sup_size_bin, num_class_bin


def superpixel_composition(gt: np.ndarray, spx: np.ndarray, nseg: int,
                           num_classes: int, selected: List[int],
                           ignore_boundaries: bool = False,
                           ignore_idx: int = 255):
    """visualize_minor semantics: (superpixel_cls (S, C+1) uint8 multi-hot
    with the ignore class in the LAST column, superpixel_size (S, C+1)
    int32 per-class pixel counts, -1 where the class is absent). With
    ignore_boundaries, thick superpixel boundaries are excluded first
    (find_boundaries mode='thick' equivalent)."""
    spx = np.asarray(spx)
    flat_spx = spx.reshape(-1).copy()
    flat_gt = np.asarray(gt).reshape(-1)
    if ignore_boundaries:
        flat_spx[boundaries_thick(spx).reshape(-1)] = nseg
    hist = _hist(flat_spx, flat_gt, nseg, num_classes, ignore_idx)
    cls = np.zeros((nseg, num_classes + 1), np.uint8)
    size = np.full((nseg, num_classes + 1), -1, np.int32)
    sel = np.asarray(selected, np.int64)
    if sel.size:
        h = hist[sel]
        present = h > 0
        # an all-ignore superpixel keeps only the ignore column
        cls[sel] = present.astype(np.uint8)
        size[sel] = np.where(present, h, -1).astype(np.int32)
    return cls, size


def sample_dominant_map(gt: np.ndarray, spx: np.ndarray, nseg: int,
                        num_classes: int, selected: List[int],
                        rng: np.random.RandomState,
                        generate_ignore: bool = False,
                        ignore_idx: int = 255):
    """dominant_all_sample semantics: per selected superpixel, draw ONE
    class with probability proportional to its pixel count (the
    reference's torch.multinomial over np.unique counts) and paint the
    whole superpixel with it. generate_ignore lets the ignore class
    compete (and suppresses the final 255 restore). Gumbel-max over log
    counts reproduces the categorical draw without a Python loop."""
    flat_gt = np.asarray(gt).reshape(-1).copy()
    flat_spx = np.asarray(spx).reshape(-1)
    ig = num_classes if generate_ignore else None
    hist = _hist(flat_spx, flat_gt, nseg, num_classes, ignore_idx)
    counts = hist.astype(np.float64)
    if not generate_ignore:
        counts[:, num_classes] = 0  # ignore never competes
    with np.errstate(divide="ignore"):
        logits = np.log(counts)
    draw = np.argmax(logits + rng.gumbel(size=counts.shape), axis=-1)
    sel = np.asarray(selected, np.int64)
    ignore_mask = flat_gt == ignore_idx
    if sel.size:
        has_any = counts[sel].sum(-1) > 0
        for p, ok in zip(sel, has_any):  # paint; sel is small
            if not ok:
                continue
            cls = draw[p]
            val = ignore_idx if cls == num_classes else cls
            m = flat_spx == p
            if not generate_ignore:
                m &= ~ignore_mask
            flat_gt[m] = val
    if not generate_ignore:
        flat_gt[ignore_mask] = ignore_idx
    return flat_gt.reshape(np.asarray(gt).shape)


class RegionStatsDataset:
    """Loader-name-keyed wrapper over a RegionDatasetOr base serving the
    four analysis item contracts (mode = 'count_all' | 'visualize_minor'
    | 'dom_w_gt' | 'dominant_sample'). count_all / visualize_minor are
    full-res analysis loaders (identity transform); dom_w_gt /
    dominant_sample are TRAINING loaders that apply the base's train
    transform (rebuilt with mode-correct pad values) before masking /
    sampling, like the reference."""

    def __init__(self, cfg, base, mode: str, *,
                 pred_ignore: bool = False, generate_ignore: bool = False,
                 seed: int = 0):
        self.cfg = cfg
        self.base = base
        self.mode = mode
        self.pred_ignore = pred_ignore
        self.generate_ignore = generate_ignore
        self.seed = seed
        # advancing stream for the dominant_sample draws (fresh labels per
        # epoch, like the reference's worker RNG); RandomState methods are
        # GIL-serialized so concurrent fetch threads can't corrupt it
        self.rng = np.random.RandomState(seed)
        # dom_w_gt / dominant_sample are TRAINING loaders in the reference
        # (transform applied before masking/sampling: region_cityscapes_
        # dom_w_gt.py:65, region_cityscapes_dominant_all_sample.py:31); the
        # base's train transform is rebuilt with mode-correct pad_values —
        # its own list matches the base's label tuple, not this wrapper's.
        self.transform = None
        bt = getattr(base, "transform", None)
        if bt is not None and mode in ("dom_w_gt", "dominant_sample"):
            from mulactseg_tpu.data.transforms import PairedTransform

            pads = ([cfg.ignore_idx, cfg.ignore_idx, cfg.nseg]
                    if mode == "dom_w_gt" else [cfg.ignore_idx, cfg.nseg])
            self.transform = PairedTransform(
                scale_range=bt.scale_range, crop_size=bt.crop_size,
                pad_values=pads, img_pad=bt.img_pad, hflip=bt.hflip,
                resize_to=bt.resize_to, seed=seed)

    # the active-set machinery (load_datalist etc.) talks to these
    @property
    def im_idx(self):
        return self.base.im_idx

    @im_idx.setter
    def im_idx(self, v):
        self.base.im_idx = v

    @property
    def suppix(self):
        return self.base.suppix

    @suppix.setter
    def suppix(self, v):
        self.base.suppix = v

    def __len__(self):
        return len(self.base.im_idx)

    def __getitem__(self, index: int) -> Dict:
        from mulactseg_tpu.data.datasets import (
            normalize,
            open_image,
            open_label,
            open_spx,
        )
        from mulactseg_tpu.tools.label_assignment import (
            dominant_label_for_image,
        )

        cfg = self.cfg
        img_p, lbl_p, spx_p = self.base.im_idx[index]
        spx = open_spx(spx_p)
        selected = self.base.suppix.get(spx_p, [])
        if self.mode == "count_all":
            gt = self.base.encode_fn(open_label(lbl_p))
            size_bin, ncls_bin = superpixel_count_stats(
                gt, spx, cfg.nseg, cfg.num_classes, selected,
                cfg.ignore_idx)
            return {"sup_size_bin": size_bin, "num_class_bin": ncls_bin,
                    "fnames": self.base.im_idx[index]}
        if self.mode == "visualize_minor":
            gt = self.base.encode_fn(open_label(lbl_p))
            cls, size = superpixel_composition(
                gt, spx, cfg.nseg, cfg.num_classes, selected,
                ignore_boundaries=getattr(cfg, "ignore_boundaries", False),
                ignore_idx=cfg.ignore_idx)
            return {"superpixel_info": (cls, size),
                    "superpixel": spx.astype(np.int32),
                    "target": gt.astype(np.int32),
                    "fname": self.base.im_idx[index]}
        image_u8 = open_image(img_p)
        if self.mode == "dominant_sample":
            # reference order (region_cityscapes_dominant_all_sample.py:
            # 31-52): transform (scale/crop/flip) FIRST, then sample each
            # selected superpixel from the counts visible in the crop.
            # Every call RE-SAMPLES from an advancing stream (self.rng) —
            # the label-noise averaging across epochs IS the point of the
            # 'sample' arm (the reference advances torch's worker RNG).
            # GIL-serialized RandomState calls are safe from the loader's
            # fetch threads; draw order (hence exact labels) is
            # thread-schedule-dependent, like the reference's workers.
            if self.transform is not None:
                image, (raw, spx) = self.transform(
                    image_u8, [open_label(lbl_p), spx])
                gt = self.base.encode_fn(raw)
            else:
                image = normalize(image_u8)
                gt = self.base.encode_fn(open_label(lbl_p))
            dom = sample_dominant_map(gt, spx, cfg.nseg, cfg.num_classes,
                                      selected, self.rng,
                                      self.generate_ignore, cfg.ignore_idx)
            return {"images": image, "labels": dom.astype(np.int32),
                    "spx": np.asarray(spx).astype(np.int32),
                    "fnames": self.base.im_idx[index]}
        if self.mode == "dom_w_gt":
            # dominant map computed full-res (== the offline dominant file
            # the reference loads from lbl_fname), pred_ignore substitution
            # BEFORE the transform, selection masking AFTER — the exact
            # order of region_cityscapes_dom_w_gt.py:44-80
            if hasattr(self.base, "_gt_path"):
                # dominant arm: lbl_p IS the offline dominant file (raw
                # trainIds — exactly what the reference loads at :46);
                # precise GT comes from the gtFine path
                dom = np.asarray(open_label(lbl_p))
                precise = self.base.encode_fn(
                    open_label(self.base._gt_path(lbl_p)))
            else:
                # Or arm: lbl_p is the precise GT; the dominant map is
                # computed on the fly (== the offline generator's output)
                precise = self.base.encode_fn(open_label(lbl_p))
                dom = dominant_label_for_image(precise, spx, cfg.nseg,
                                               cfg.num_classes)
            if self.pred_ignore:
                # 255 -> extra class when the checkpoint predicts ignore
                # (region_cityscapes_dom_w_gt.py:40,60)
                dom = np.where(dom == cfg.ignore_idx, cfg.num_classes, dom)
                precise = np.where(precise == cfg.ignore_idx,
                                   cfg.num_classes, precise)
            if self.transform is not None:
                image, (dom, precise, spx) = self.transform(
                    image_u8, [dom, precise, spx])
            else:
                image = normalize(image_u8)
            mask = np.isin(spx, np.asarray(selected, np.int64))
            dom = np.where(mask, dom, cfg.ignore_idx)
            return {"images": image, "target": dom.astype(np.int32),
                    "labels": np.asarray(precise).astype(np.int32),
                    "spx": np.asarray(spx).astype(np.int32),
                    "spmask": mask,
                    "fnames": self.base.im_idx[index]}
        raise KeyError(self.mode)


# loader-name fragments (reference module names) -> RegionStatsDataset mode
LOADER_MODES = {
    "count_all": "count_all",
    "visualize_minor": "visualize_minor",
    "dom_w_gt": "dom_w_gt",
    "dominant_all_sample": "dominant_sample",
}


def stats_mode_for_loader(loader: str) -> Optional[str]:
    for frag, mode in LOADER_MODES.items():
        if frag in loader:
            return mode
    return None
