"""Dataset readers for the reference's on-disk formats.

File formats (dataloader/region_cityscapes.py:48-101,137-153):
  - datalist .txt: three tab-separated paths per line (image, label, spx);
  - region dict .json: {spx_path: [size, missing_ids]} or {spx_path: ids};
  - superpixel maps: .png/.jpg (int image) or .pkl (np archive with a
    'labels' array);
  - multi_hot_cls.npy (N, nseg, C+1) + sp_size.npy, indexed by label-file
    stem through id_to_index (region_cityscapes_or_tensor.py:32-44).

Differences from the reference by design: samples carry the multi-hot
annotation under 'target' (the reference overloads 'labels'); transforms
are the numpy PairedTransform pipeline; VOC and Cityscapes share one
implementation (encode_fn hook instead of *_voc.py file twins).
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle
from typing import Callable, Dict, List, Optional

import numpy as np
from PIL import Image

from mulactseg_tpu.data.constants import ID_TO_TRAIN_ID
from mulactseg_tpu.data.transforms import PairedTransform, normalize


def load_region_dict(path: str) -> Dict[str, List[int]]:
    with open(path) as f:
        data = json.load(f)
    first = next(iter(data.values()))
    if isinstance(first, list) and len(first) == 2 and isinstance(first[1], list):
        return {k: [i for i in range(size) if i not in missing]
                for k, (size, missing) in data.items()}
    return {k: list(v) for k, v in data.items()}


class _DecodeCache:
    """Byte-capped LRU over decoded files. AL training revisits the same
    small labeled set for 80k iterations, so PNG decode (~175 ms/image at
    1024x2048, the single-thread input-pipeline bottleneck measured by
    tools_dev/bench_e2e.py) is pure waste after the first epoch. Cached
    arrays are treated as read-only — every consumer below copies via
    transform/astype/encode before mutation. Cap via
    MULACTSEG_DECODE_CACHE_MB (0 disables; default 2048)."""

    def __init__(self):
        import collections
        import threading

        self._d = collections.OrderedDict()
        self._bytes = 0
        self._lock = threading.Lock()

    def _cap(self) -> int:
        return int(os.environ.get("MULACTSEG_DECODE_CACHE_MB",
                                  "2048")) * 1024 * 1024

    def get(self, key, loader):
        cap = self._cap()
        if cap <= 0:
            return loader()
        with self._lock:
            if key in self._d:
                self._d.move_to_end(key)
                return self._d[key]
        val = loader()
        with self._lock:
            if key not in self._d:
                self._d[key] = val
                self._bytes += val.nbytes
                while self._bytes > cap and len(self._d) > 1:
                    _, old = self._d.popitem(last=False)
                    self._bytes -= old.nbytes
        return val

    def clear(self):
        with self._lock:
            self._d.clear()
            self._bytes = 0


_decode_cache = _DecodeCache()


def spmask_from_selected(spx: np.ndarray, selected,
                         nseg: int) -> np.ndarray:
    """np.isin(spx, selected) for superpixel maps, ~2x faster as a boolean
    LUT gather: spx values are ids < nseg plus the crop-pad value nseg
    (transform.py:62 convention), so a (nseg+1)-entry table covers every
    pixel; out-of-range ids clip onto the never-selected pad row."""
    lut = np.zeros(nseg + 1, bool)
    sel = np.asarray(selected, np.int64)
    if sel.size:
        lut[sel[sel < nseg]] = True
    return lut[np.minimum(spx, nseg)]


def open_image(path: str) -> np.ndarray:
    """Decoded RGB uint8 (cached; treat as read-only)."""
    return _decode_cache.get(
        ("img", path),
        lambda: np.asarray(Image.open(path).convert("RGB")))


def open_label(path: str) -> np.ndarray:
    """Decoded raw label array (cached, pre-encode; read-only)."""
    return _decode_cache.get(
        ("lbl", path), lambda: np.asarray(Image.open(path)))


def _open_spx_impl(path: str) -> np.ndarray:
    ext = path.rsplit(".", 1)[-1]
    if ext in ("png", "jpg"):
        return np.asarray(Image.open(path), dtype=np.int32)
    if ext == "pkl":
        with open(path, "rb") as f:
            arch = pickle.load(f)
        return np.asarray(arch["labels"], dtype=np.int32)
    if ext == "npy":
        arch = np.load(path, allow_pickle=True)
        if isinstance(arch, np.ndarray) and arch.dtype == object:
            arch = arch.item()
        if isinstance(arch, dict):
            return np.asarray(arch["labels"], dtype=np.int32)
        return np.asarray(arch, dtype=np.int32)
    raise ValueError(f"unsupported superpixel file {path}")


def open_spx(path: str) -> np.ndarray:
    return _decode_cache.get(("spx", path), lambda: _open_spx_impl(path))


def encode_cityscapes(target: np.ndarray) -> np.ndarray:
    return ID_TO_TRAIN_ID[np.asarray(target, dtype=np.int64)].astype(np.int32)


def encode_identity(target: np.ndarray) -> np.ndarray:
    return np.asarray(target, dtype=np.int32)


def encode_synthia(target: np.ndarray) -> np.ndarray:
    """SYNTHIA raw id -> cityscapes train id (dataset.py SYNTHIA
    encode_target; dataloader/constant.py syn_id_to_train_id)."""
    from mulactseg_tpu.data.constants import SYN_ID_TO_TRAIN_ID

    t = np.asarray(target, dtype=np.int64)
    safe = np.clip(t, 0, len(SYN_ID_TO_TRAIN_ID) - 1)
    out = SYN_ID_TO_TRAIN_ID[safe].astype(np.int32)
    return np.where(t >= len(SYN_ID_TO_TRAIN_ID), 255, out)


def open_label_synthia(path: str) -> np.ndarray:
    """SYNTHIA GT PNGs are 16-bit multi-channel; the class id is channel 0
    cast to uint8 (dataset.py:155-157, which uses imageio's PNG-FI
    plugin). PIL handles the common encodings; imageio is used when
    present for the freeimage-only files."""
    try:
        img = np.asarray(Image.open(path))
    except Exception:
        import imageio

        img = np.asarray(imageio.imread(path, format="PNG-FI"))
    if img.ndim == 3:
        img = img[:, :, 0]
    return img.astype(np.uint8)


def multi_hot_paths(cfg) -> Dict[str, str]:
    """Reference path conventions: cityscapes at
    region_cityscapes_or_tensor.py:27-34, VOC at
    region_voc_or_tensor.py:38-43 (superpixels/pascal_voc_seg tree)."""
    name = ("gtFine_multi_tensor_trim_{k}x{k}".format(k=cfg.trim_kernel_size)
            if cfg.trim_multihot_boundary else "gtFine_multi_tensor")
    if cfg.dataset == "voc":
        base = os.path.join(cfg.data_root, "superpixels", "pascal_voc_seg",
                            f"{cfg.spx_method}_{cfg.nseg}", "train",
                            name if cfg.trim_multihot_boundary else "multihot")
    else:
        base = os.path.join(cfg.data_root, "superpixel_seed", cfg.dataset,
                            f"{cfg.spx_method}_{cfg.nseg}", "train", name)
    return {"multi_hot_cls": os.path.join(base, "multi_hot_cls.npy"),
            "sp_size": os.path.join(base, "sp_size.npy")}


class RegionDatasetOr:
    """Region dataset with precomputed multi-hot annotations
    (RegionCityscapesOr, region_cityscapes_or_tensor.py:16-96)."""

    def __init__(self, cfg, datalist: str, region_dict: str, split: str,
                 transform: Optional[PairedTransform] = None,
                 encode_fn: Callable = encode_cityscapes,
                 multi_hot_cls: Optional[np.ndarray] = None,
                 load_gt: bool = False,
                 drop_last_channel: Optional[bool] = None,
                 ignore_gt_in_spmask: bool = False,
                 load_smaller_spx: bool = False,
                 async_views: bool = False,
                 weak_size: Optional[tuple] = None,
                 multihot_transform: Optional[str] = None,
                 sp_gt_size: Optional[np.ndarray] = None,
                 oracle_labels: bool = False,
                 async_weak_hflip: bool = False,
                 oracle_keep_ignore: bool = False,
                 plbl_dir: Optional[str] = None):
        # load_smaller_spx: also load the finer superpixel map by path
        # substitution seeds_{nseg} -> seeds_{small_nseg}
        # (region_cityscapes_or_tensor.py:76-80); async_views: add an
        # unaugmented full-view 'weak' copy resized to weak_size
        # (region_cityscapes_or_tensor_ignore_async.py:17-66);
        # async_weak_hflip: the asyncv2 variant, whose weak view ALSO
        # random-hflips (the only v1/v2 delta —
        # region_cityscapes_or_tensor_ignore_asyncv2.py:19)
        self.load_smaller_spx = load_smaller_spx
        self.async_views = async_views
        self.weak_size = weak_size
        if async_views:
            # one shared advancing transform: the v2 hflip must redraw per
            # CALL (fresh per epoch — ExtRandomHorizontalFlip in
            # region_cityscapes_or_tensor_ignore_asyncv2.py:19), exactly
            # like the strong transform's own stream
            from mulactseg_tpu.data.transforms import train_out_dtype

            self._weak_tf = PairedTransform(
                resize_to=weak_size, hflip=async_weak_hflip,
                emit_u8=getattr(cfg, "ship_uint8", False),
                out_dtype=train_out_dtype(cfg),
                seed=cfg.seed + 7919)
        self.cfg = cfg
        self.split = split
        self.transform = transform
        self.encode_fn = encode_fn
        # the _ignore loader variant removes GT==255 pixels from spmask
        # (region_cityscapes_or_tensor_ignore.py:49-51)
        self.ignore_gt_in_spmask = ignore_gt_in_spmask
        # oracle loaders train on precise GT inside the selected
        # superpixels: 255-inside -> the extra class, unselected -> 255
        # (region_cityscapes_or_oracle.py:29-45); the woignore variant
        # keeps 255 as-is inside (region_cityscapes_or_oracle_woignore.py:
        # 41-44)
        self.oracle_labels = oracle_labels
        self.oracle_keep_ignore = oracle_keep_ignore
        # or_plbl loader: the multi-hot sample additionally carries the
        # previous round's saved pseudo-label map as 'labels' — the data
        # path of the _sequence criterion (region_cityscapes_or_plbl.py:
        # 26-60; plbl keyed per image from the plbl_gen round directory)
        self.plbl_dir = plbl_dir
        self.load_gt = load_gt or ignore_gt_in_spmask or oracle_labels
        region = load_region_dict(region_dict)
        self.im_idx: List[List[str]] = []
        self.suppix: Dict[str, List[int]] = {}
        with open(datalist) as f:
            lines = [l for l in f.read().splitlines() if l.strip()]
        for line in lines:
            img, lbl, spx = line.split("\t")
            full = [os.path.join(cfg.data_root, p) for p in (img, lbl, spx)]
            self.im_idx.append(full)
            self.suppix[full[2]] = list(region[spx])
        if multi_hot_cls is not None:
            self.multi_hot_cls = multi_hot_cls
        else:
            self.multi_hot_cls = np.load(multi_hot_paths(cfg)["multi_hot_cls"])
        # VOC drops the trailing ignore channel so targets align with the
        # 21-class model (region_voc_or_tensor.py:53)
        if drop_last_channel is None:
            drop_last_channel = cfg.dataset == "voc"
        if drop_last_channel and multi_hot_cls is None:
            self.multi_hot_cls = self.multi_hot_cls[:, :, :-1]
        if multihot_transform:
            # research-loader rewrite of the multi-hot tensor from GT
            # class-wise superpixel sizes (data/research_filters.py;
            # region_cityscapes_or_tensor_*_gt.py loaders)
            from mulactseg_tpu.data.research_filters import (
                apply_multihot_transform)

            if sp_gt_size is None:
                base = os.path.dirname(multi_hot_paths(cfg)["multi_hot_cls"])
                sp_gt_size = np.load(os.path.join(base, "sp_gt_size.npy"))
            if sp_gt_size.shape[-1] != self.multi_hot_cls.shape[-1]:
                sp_gt_size = sp_gt_size[..., :self.multi_hot_cls.shape[-1]]
            self.multi_hot_cls = apply_multihot_transform(
                multihot_transform, np.asarray(self.multi_hot_cls),
                np.asarray(sp_gt_size), cfg, seed=cfg.seed)
        self.isselected = np.zeros(self.multi_hot_cls.shape[:-1], np.float32)
        self.id_to_index = {}
        for index, line in enumerate(lines):
            lbl = line.split("\t")[1]
            self.id_to_index[os.path.basename(lbl).split(".")[0]] = index

    def __len__(self):
        return len(self.im_idx)

    def _target_index(self, lbl_path: str) -> int:
        return self.id_to_index[os.path.basename(lbl_path).split(".")[0]]

    def __getitem__(self, index: int) -> Dict:
        img_p, lbl_p, spx_p = self.im_idx[index]
        image = open_image(img_p)
        spx = open_spx(spx_p)
        target = np.asarray(self.multi_hot_cls[self._target_index(lbl_p)],
                            np.float32)

        if self.split == "active-ulabel":
            if self.transform is not None:
                image, (spx,) = self.transform(image, [spx])
            elif not getattr(self.cfg, "ship_uint8", False):
                image = normalize(image)
            # else: uint8 straight through — pool scoring ships 6 MB/image
            # instead of 24 MB and make_eval_step normalizes on device
            return {"images": image, "spx": spx.astype(np.int32),
                    "target": target, "fnames": self.im_idx[index]}

        spx_small = None
        if self.load_smaller_spx:
            small_p = spx_p.replace(f"seeds_{self.cfg.nseg}",
                                    f"seeds_{self.cfg.small_nseg}")
            spx_small = open_spx(small_p)
        gt = None
        if self.load_gt:
            gt = self.encode_fn(open_label(lbl_p))
        plbl = None
        if self.plbl_dir is not None:
            # saved pseudo-label PNG for this image, same {lbl_id}.png
            # convention as RegionDatasetPlbl / plbl.generator (the
            # reference keys by the image id — same bijection)
            lbl_id = os.path.basename(lbl_p).split(".")[0]
            plbl = np.asarray(open_label(
                os.path.join(self.plbl_dir, f"{lbl_id}.png")), np.int32)
        raw = {"image": image, "gt": gt, "spx": spx, "spx_small": spx_small}

        labels = (([gt] if gt is not None else [])
                  + ([plbl] if plbl is not None else []) + [spx]
                  + ([spx_small] if spx_small is not None else []))
        if self.transform is not None:
            image, labels = self.transform(image, labels)
        else:
            image = normalize(image)
        idx = 0
        if gt is not None:
            gt_t = labels[idx].astype(np.int32)
            idx += 1
        plbl_t = None
        if plbl is not None:
            plbl_t = labels[idx].astype(np.int32)
            idx += 1
        spx = labels[idx].astype(np.int32)
        idx += 1
        selected = self.suppix.get(spx_p, [])
        spmask = spmask_from_selected(spx, selected, self.cfg.nseg)
        if self.ignore_gt_in_spmask:
            spmask &= gt_t != self.cfg.ignore_idx
        sample = {"images": image, "target": target, "spx": spx,
                  "spmask": spmask, "fnames": self.im_idx[index]}
        if target.shape[-1] <= 31:
            # per-pixel candidate bitmask: packs the (S,C) row lookup the
            # losses would otherwise gather on device (losses/fused.py)
            from mulactseg_tpu.losses.fused import pixel_target_bits

            sample["target_bits"] = pixel_target_bits(target, spx, spmask)
        if spx_small is not None:
            sample["spx_small"] = labels[idx].astype(np.int32)
        if gt is not None:
            if self.oracle_labels:
                inside = (gt_t if self.oracle_keep_ignore else
                          np.where(gt_t == self.cfg.ignore_idx,
                                   self.cfg.num_classes, gt_t))
                sample["labels"] = np.where(spmask, inside,
                                            self.cfg.ignore_idx).astype(
                                                np.int32)
            else:
                sample["labels"] = gt_t
        if plbl_t is not None:
            # or_plbl: the pseudo-label map is the 'labels' field; the
            # multi-hot target/spx/spmask context rides alongside
            # (region_cityscapes_or_plbl.py:48-59)
            sample["labels"] = plbl_t
        if self.async_views:
            weak_tf = self._weak_tf
            wl = ([raw["gt"]] if raw["gt"] is not None else []) +                 [raw["spx"]] +                 ([raw["spx_small"]] if raw["spx_small"] is not None else [])
            img_w, wl = weak_tf(raw["image"], wl)
            j = 0
            gt_w = None
            if raw["gt"] is not None:
                gt_w = wl[j].astype(np.int32)
                j += 1
            spx_w = wl[j].astype(np.int32)
            j += 1
            spmask_w = spmask_from_selected(spx_w, selected, self.cfg.nseg)
            if self.ignore_gt_in_spmask and gt_w is not None:
                spmask_w &= gt_w != self.cfg.ignore_idx
            sample["images_weak"] = img_w
            sample["spx_weak"] = spx_w
            sample["spmask_weak"] = spmask_w
            if raw["spx_small"] is not None:
                sample["spx_small_weak"] = wl[j].astype(np.int32)
        return sample


class RegionDatasetMseg:
    """Mixed-superpixel-scale region dataset
    (mseg_region_cityscapes_or_tensor.py:17-102 over the merged-datalist
    plumbing of mseg_region_cityscapes.py:60-103).

    Each image carries annotations at several superpixel granularities
    (`nseg_list`, ascending). im_idx entries are
    ``[img_path, {str(nseg): [lbl_path, spx_path]}]`` — the format
    MsegRegionActiveSet.expand_training_set produces — and `suppix` maps
    spx_path -> selected superpixel ids.

    TPU-first batch layout: instead of ragged per-image lists collated as
    Python lists (the reference's 'mseg_labels'/'mseg_spx' lists), every
    sample is padded to the full level axis S = len(nseg_list):
      - 'mseg_spx'    (S, H, W) int32 — absent levels zero;
      - 'mseg_spmask' (S, H, W) bool  — absent levels all-False (this is
        what makes them loss-neutral, see losses/mseg.py);
      - 'nseg_lbl'    (S,) bool level-present indicator
        (mseg_region_cityscapes_or_tensor.py:94-96);
      - 'mseg_target_{i}' (nseg_i, C+1) per-level multi-hot rows.
    Static shapes mean one jitted step covers every level mixture.
    """

    def __init__(self, cfg, datalists: Dict[int, str],
                 region_dicts: Dict[int, str], split: str,
                 transform: Optional[PairedTransform] = None,
                 encode_fn: Callable = encode_cityscapes,
                 multi_hot_by_nseg: Optional[Dict[int, np.ndarray]] = None):
        self.cfg = cfg
        self.split = split
        self.transform = transform
        self.encode_fn = encode_fn
        self.nseg_list = sorted(int(n) for n in cfg.nseg_list)
        if not self.nseg_list:
            raise ValueError("RegionDatasetMseg requires cfg.nseg_list")
        self.root = cfg.data_root

        # merged region dict over all levels (mseg_region_cityscapes.py:38-42)
        self.region: Dict[str, List[int]] = {}
        for nseg in self.nseg_list:
            for k, v in load_region_dict(region_dicts[nseg]).items():
                self.region[os.path.join(cfg.data_root, k)] = v
                self.region[k] = v

        # per-level multi-hot tensors + label-stem index
        # (mseg_region_cityscapes_or_tensor.py:43-54)
        self.mseg_mh_cls: Dict[int, np.ndarray] = {}
        self.id_to_index: Dict[int, Dict[str, int]] = {}
        self._lines: Dict[int, List[str]] = {}
        for nseg in self.nseg_list:
            with open(datalists[nseg]) as f:
                lines = [l for l in f.read().splitlines() if l.strip()]
            self._lines[nseg] = lines
            if multi_hot_by_nseg is not None:
                self.mseg_mh_cls[nseg] = multi_hot_by_nseg[nseg]
            else:
                sub = dataclasses.replace(cfg, nseg=nseg)
                self.mseg_mh_cls[nseg] = np.load(
                    multi_hot_paths(sub)["multi_hot_cls"])
            idx = {}
            for i, line in enumerate(lines):
                lbl = line.split("\t")[1]
                idx[os.path.basename(lbl).split(".")[0]] = i
            self.id_to_index[nseg] = idx

        self.im_idx: List[list] = []
        self.suppix: Dict[str, List[int]] = {}
        if split in ("active-ulabel", "pool", "train"):
            # merged data list: one entry per image with every level
            # (mseg_region_cityscapes.py:89-103)
            by_img: Dict[str, Dict[str, List[str]]] = {}
            for nseg in self.nseg_list:
                for line in self._lines[nseg]:
                    img, lbl, spx = (os.path.join(cfg.data_root, p)
                                     for p in line.split("\t"))
                    by_img.setdefault(img, {})[str(nseg)] = [lbl, spx]
                    self.suppix[spx] = list(self.region.get(spx, []))
            self.im_idx = [[img, d] for img, d in by_img.items()]

    def __len__(self):
        return len(self.im_idx)

    def __getitem__(self, index: int) -> Dict:
        img_p, lbl_spx = self.im_idx[index]
        image = open_image(img_p)
        S = len(self.nseg_list)
        spx_maps: List[Optional[np.ndarray]] = [None] * S
        present = np.zeros(S, bool)
        for s, nseg in enumerate(self.nseg_list):
            if str(nseg) in lbl_spx:
                spx_maps[s] = open_spx(lbl_spx[str(nseg)][1])
                present[s] = True
        shape = next(m for m in spx_maps if m is not None).shape
        labels = [m if m is not None else np.zeros(shape, np.int32)
                  for m in spx_maps]
        if self.transform is not None:
            image, labels = self.transform(image, labels)
        else:
            image = normalize(image)
        sample: Dict = {"images": image, "fnames": [img_p, lbl_spx],
                        "nseg_lbl": present}
        spx_stack, mask_stack = [], []
        for s, nseg in enumerate(self.nseg_list):
            spx = labels[s].astype(np.int32)
            if present[s]:
                spx_path = lbl_spx[str(nseg)][1]
                lbl_path = lbl_spx[str(nseg)][0]
                selected = self.suppix.get(spx_path, [])
                mask = np.isin(spx, selected)
                stem = os.path.basename(lbl_path).split(".")[0]
                row = self.id_to_index[nseg][stem]
                target = np.asarray(self.mseg_mh_cls[nseg][row], np.float32)
            else:
                mask = np.zeros(spx.shape, bool)
                target = np.zeros(
                    (self.mseg_mh_cls[nseg].shape[1],
                     self.mseg_mh_cls[nseg].shape[2]), np.float32)
            spx_stack.append(spx)
            mask_stack.append(mask)
            sample[f"mseg_target_{s}"] = target
        sample["mseg_spx"] = np.stack(spx_stack)
        sample["mseg_spmask"] = np.stack(mask_stack)
        return sample


class RegionDatasetDominant:
    """Dominant-labeling baseline loader family — the paper's 'Dominant'
    query arm (region_cityscapes.py:15-135 with dominant_labeling=True,
    plus its predignore / withgt / oracle subclasses):

    - the datalist's label paths point at offline `gtFine_dominant*` PNGs
      (generated by tools/label_assignment); with dominant_labeling the
      labels load RAW (already trainIds + 255), else they pass encode_fn.
      Datalist substitutions mirror get_data_list (region_cityscapes.py:
      56-68): without cfg.known_ignore `gtFine_dominant` ->
      `gtFine_dominant_ignore`; with cfg.prob_dominant ->
      `gtFine_dominant_ignore_sample`.
    - unselected superpixels mask to 255 (mask_region branch, :113-124).
    - pred_ignore (region_cityscapes_predignore.py:38-57): 255 -> C
      BEFORE masking, so discovered-ignore trains as the extra class
      while unselected stays 255.
    - with_gt (region_cityscapes_withgt.py): the precise GT also rides
      along under 'target'.
    - full_supervision (region_cityscapes_oracle.py:24-27): the labeled
      set starts as the ENTIRE datalist with every superpixel selected.
    """

    def __init__(self, cfg, datalist: Optional[str], region_dict: str,
                 split: str = "active-label",
                 transform: Optional[PairedTransform] = None,
                 encode_fn: Callable = encode_cityscapes,
                 *, pred_ignore: bool = False, with_gt: bool = False,
                 full_supervision: bool = False):
        self.cfg = cfg
        self.split = split
        self.transform = transform
        self.encode_fn = encode_fn
        self.pred_ignore = pred_ignore
        self.with_gt = with_gt
        region = load_region_dict(region_dict)
        self.im_idx: List[List[str]] = []
        self.suppix: Dict[str, List[int]] = {}
        if datalist is not None:
            with open(datalist) as f:
                lines = [l for l in f.read().splitlines() if l.strip()]
            for line in lines:
                cols = line.split("\t")
                if len(cols) == 1:
                    # VOC dominant datalists are bare image ids; paths are
                    # constructed (region_voc_dominant_16.py:81-91 — the
                    # reference hardcodes seeds_16, here seeds_{nseg})
                    fid = cols[0]
                    seeds = f"superpixels/pascal_voc_seg/seeds_{cfg.nseg}"
                    img = f"VOC2012/JPEGImages/{fid}.jpg"
                    lbl = (f"{seeds}/train/gtFine_dominant/{fid}.png"
                           if cfg.dominant_labeling else
                           f"VOC2012/SegmentationClass/{fid}.png")
                    spx = f"{seeds}/train/label/{fid}.pkl"
                    rkey = fid
                else:
                    img, lbl, spx = cols
                    rkey = spx
                if not cfg.known_ignore:
                    lbl = lbl.replace("gtFine_dominant",
                                      "gtFine_dominant_ignore")
                if cfg.prob_dominant:
                    lbl = lbl.replace("gtFine_dominant",
                                      "gtFine_dominant_ignore_sample")
                full = [os.path.join(cfg.data_root, p)
                        for p in (img, lbl, spx)]
                self.im_idx.append(full)
                self.suppix[full[2]] = list(region[rkey])
        if not full_supervision and split == "active-label":
            # labeled set starts empty; the active set fills it per round
            self.im_idx = []
            self.suppix = {}

    def __len__(self):
        return len(self.im_idx)

    def __getitem__(self, index: int) -> Dict:
        img_p, lbl_p, spx_p = self.im_idx[index]
        image = open_image(img_p)
        spx = open_spx(spx_p)
        if self.split == "active-ulabel":
            if self.transform is not None:
                image, (spx,) = self.transform(image, [spx])
            else:
                image = normalize(image)
            return {"images": image, "spx": spx.astype(np.int32),
                    "fnames": self.im_idx[index]}
        raw = open_label(lbl_p)
        target = (np.asarray(raw) if self.cfg.dominant_labeling
                  else self.encode_fn(raw))
        # pred_ignore substitution BEFORE the transform (region_cityscapes_
        # predignore.py:38-40, _dom_w_gt.py:48-63): crop padding added by
        # the transform (value 255) must STAY 255, not become the
        # discovered-ignore class
        if self.pred_ignore:
            target = np.where(target == self.cfg.ignore_idx,
                              self.cfg.num_classes, target)
        labels = [target, spx]
        if self.with_gt:
            gt = self.encode_fn(open_label(self._gt_path(lbl_p)))
            if self.pred_ignore:
                gt = np.where(gt == self.cfg.ignore_idx,
                              self.cfg.num_classes, gt)
            labels.append(gt)
        if self.transform is not None:
            image, labels = self.transform(image, labels)
        else:
            image = normalize(image)
        target = np.asarray(labels[0]).astype(np.int32)
        spx = np.asarray(labels[1]).astype(np.int32)
        selected = self.suppix.get(spx_p, [])
        mask = np.isin(spx, np.asarray(selected, np.int64))
        target = np.where(mask, target, self.cfg.ignore_idx).astype(np.int32)
        sample = {"images": image, "labels": target, "spx": spx,
                  "fnames": self.im_idx[index]}
        if self.with_gt:
            sample["target"] = np.asarray(labels[2]).astype(np.int32)
        return sample

    def _gt_path(self, lbl_p: str) -> str:
        """Precise-GT path, mirroring region_cityscapes_withgt.py:109-111:
        '{root}/gtFine/train/{city}/{id}_gtFine_labelIds.png' from the
        dominant file's basename id."""
        id_ = os.path.basename(lbl_p).split(".")[0]
        return os.path.join(self.cfg.data_root, "gtFine", "train",
                            id_.split("_")[0],
                            f"{id_}_gtFine_labelIds.png")


class EvalRegionDatasetAll:
    """Full-resolution loader for pseudo-label generation and analysis
    (eval_region_cityscapes_all.py:10-69): precise GT with 255 mapped to
    the extra class, identity transform, spmask over the labeled set.

    remove_dominant reproduces the base loader's analysis-mode filter
    (eval_region_cityscapes_all.py:18-24,52-57): superpixels whose
    multi-hot annotation has exactly one candidate class are dropped from
    spmask UNLESS the method is an eval_save_* (pseudo-label saving)
    run. mask_unselected is the eval_region_cityscapes_withinmulti.py:61
    variant: the precise GT is additionally 255-masked outside spmask.
    The ratiofilt variant (eval_region_cityscapes_ratiofilt_all.py) needs
    no option here — it only swaps the multi-hot source, which the base
    dataset's `multihot_transform="ratiofilter"` already rewrote."""

    def __init__(self, cfg, base: RegionDatasetOr, suppix: Dict[str, List[int]],
                 *, remove_dominant: bool = False,
                 mask_unselected: bool = False, emit_u8: bool = False):
        self.cfg = cfg
        self.base = base
        self.suppix = suppix
        self.remove_dominant = remove_dominant
        self.mask_unselected = mask_unselected
        # emit_u8: hand the raw uint8 image through (6 MB instead of the
        # 24 MB f32 normalized tensor on the wire); the consumer
        # normalizes — PseudoLabelGenerator does it on device inside the
        # fused step, or on host (same LUT, bit-identical) on the unfused
        # paths. Enabled by the plbl branch of cli/eval_al.py.
        self.emit_u8 = emit_u8
        self.im_idx = sorted([k for k in base.im_idx if k[2] in suppix])

    def __len__(self):
        return len(self.im_idx)

    def __getitem__(self, index: int) -> Dict:
        img_p, lbl_p, spx_p = self.im_idx[index]
        image = open_image(img_p)
        if not self.emit_u8:
            image = normalize(image)
        gt = self.base.encode_fn(open_label(lbl_p))
        gt = np.where(gt == self.cfg.ignore_idx, self.cfg.num_classes,
                      gt).astype(np.int32)
        spx = open_spx(spx_p)
        target = np.asarray(
            self.base.multi_hot_cls[self.base._target_index(lbl_p)],
            np.float32)
        selected = np.asarray(self.suppix.get(spx_p, []), np.int64)
        if self.remove_dominant and selected.size:
            # keep only multi-candidate superpixels
            # (eval_region_cityscapes_all.py:52-57)
            selected = selected[target[selected].sum(-1) != 1]
        spmask = np.isin(spx, selected)
        if self.mask_unselected:
            gt = np.where(spmask, gt, self.cfg.ignore_idx).astype(np.int32)
        return {"images": image, "labels": gt, "spx": spx.astype(np.int32),
                "spmask": spmask, "target": target,
                "fnames": [img_p, lbl_p, spx_p]}


class RegionDatasetPlbl:
    """Stage-2 loader: saved pseudo-label PNGs as training targets
    (region_cityscapes_plbl.py:18-48)."""

    def __init__(self, cfg, im_idx: List[List[str]], plbl_dir: str,
                 transform: Optional[PairedTransform] = None):
        self.cfg = cfg
        self.im_idx = list(im_idx)
        self.plbl_dir = plbl_dir
        self.transform = transform
        self.suppix: Dict[str, List[int]] = {}

    def __len__(self):
        return len(self.im_idx)

    def __getitem__(self, index: int) -> Dict:
        img_p, lbl_p, _ = self.im_idx[index]
        image = open_image(img_p)
        lbl_id = os.path.basename(lbl_p).split(".")[0]
        plbl = np.asarray(open_label(
            os.path.join(self.plbl_dir, f"{lbl_id}.png")), dtype=np.int32)
        if self.transform is not None:
            image, (plbl,) = self.transform(image, [plbl])
        else:
            image = normalize(image)
        return {"images": image, "labels": plbl.astype(np.int32),
                "fnames": self.im_idx[index]}


class ValDataset:
    """Validation/eval dataset: (image, GT) pairs from a datalist
    (dataloader/dataset.py CityscapesGTA5/VOC conventions)."""

    def __init__(self, cfg, datalist: str,
                 transform: Optional[PairedTransform] = None,
                 encode_fn: Callable = encode_cityscapes,
                 label_opener: Optional[Callable] = None):
        # label_opener: e.g. open_label_synthia for 16-bit SYNTHIA GT
        self.cfg = cfg
        self.transform = transform
        self.encode_fn = encode_fn
        self.label_opener = label_opener
        self.im_idx: List[List[str]] = []
        with open(datalist) as f:
            for line in f.read().splitlines():
                if not line.strip():
                    continue
                parts = line.split("\t")
                self.im_idx.append(
                    [os.path.join(cfg.data_root, p) for p in parts[:2]])

    def __len__(self):
        return len(self.im_idx)

    def __getitem__(self, index: int) -> Dict:
        img_p, lbl_p = self.im_idx[index]
        image = open_image(img_p)
        raw = (self.label_opener(lbl_p) if self.label_opener is not None
               else open_label(lbl_p))
        gt = self.encode_fn(raw)
        if self.transform is not None:
            image, (gt,) = self.transform(image, [gt])
        else:
            image = normalize(image)
        return {"images": image, "labels": gt.astype(np.int32),
                "fnames": self.im_idx[index]}
