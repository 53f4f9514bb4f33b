"""Shared CLI wiring: config -> datasets -> active set (the
get_active_dataset / initialization plumbing of train_AL.py:18-36 and
dataloader/__init__.py:112-149)."""

from __future__ import annotations

import os
import random

import numpy as np

from mulactseg_tpu.active import RegionActiveSet
from mulactseg_tpu.data import (
    DataProvider,
    RegionDatasetOr,
    SyntheticRegionDataset,
    ValDataset,
    encode_cityscapes,
    encode_identity,
    get_train_transform,
    get_val_transform,
)
from mulactseg_tpu.data.stats import stats_mode_for_loader
from mulactseg_tpu.utils.logging import MetricsSink, get_file_logger


def seed_everything(seed: int):
    random.seed(seed)
    np.random.seed(seed)


def build_active_datasets(cfg):
    """Returns (active_set, val_dataset). loader='synthetic' builds the
    in-memory fixture (CI/smoke); otherwise the real region readers."""
    if cfg.loader.startswith("synthetic"):
        mk = lambda split: SyntheticRegionDataset(
            n_images=8, H=cfg.crop_size[0], W=cfg.crop_size[1],
            num_classes=cfg.num_classes, nseg=cfg.nseg, split=split,
            seed=cfg.seed)
        pool = mk("active-ulabel")
        label = mk("active-label")
        label.suppix = {}
        label.im_idx = []
        val = mk("val")
        return RegionActiveSet(cfg, pool, label), val

    if cfg.label_encoding == "identity":
        encode = encode_identity
    elif cfg.label_encoding == "cityscapes":
        encode = encode_cityscapes
    else:
        encode = (encode_cityscapes if cfg.dataset == "cityscapes"
                  else encode_identity)
    if cfg.loader.startswith("mseg"):
        return _build_mseg_datasets(cfg, encode)

    stats_mode = stats_mode_for_loader(cfg.loader)
    if not cfg.or_labeling:
        # non-Or branch (dataloader/__init__.py:143-145) — but the stats
        # loaders (dom_w_gt etc.) are selected with or_labeling unset in
        # the reference scripts too, so they must dispatch FIRST
        return _build_dominant_datasets(cfg, encode, stats_mode)

    tf_name = cfg.train_transform
    # any loader whose item carries the precise GT ([gt, spx] label list:
    # the _ignore family AND the oracle family incl. woignore) needs the
    # _multi_ignore_ transform's per-label pad values [255, nseg] — a
    # 1-entry pad list would pad GT with nseg on small scale draws
    # or_plbl rides the same two-label transform: [plbl, spx] needs pad
    # values [255, nseg] exactly like [gt, spx]
    if (("ignore" in cfg.loader or "oracle" in cfg.loader
         or "or_plbl" in cfg.loader) and "ignore" not in tf_name):
        tf_name = tf_name.replace("_multi_", "_multi_ignore_")
    train_tf = get_train_transform(tf_name, cfg, seed=cfg.seed)
    weak_size = (1024, 2048) if cfg.dataset == "cityscapes" else None
    # research loaders are name-keyed multi-hot rewrites
    # (region_cityscapes_or_tensor_{tinyfilter,ratiofilter,ratiosample,
    # dominantsample,toponebase}_gt.py)
    mh_transform = None
    for key in ("tinyfilter_recommend", "tinyfilter", "ratiofilter",
                "ratiosample", "dominantsample", "toponebase"):
        if key in cfg.loader:
            mh_transform = key
            break
    if mh_transform is None and "ratiofilt" in cfg.loader:
        # eval_region_cityscapes_ratiofilt_all.py inherits the ratiofilter
        # multi-hot rewrite under a shortened loader name
        mh_transform = "ratiofilter"
    plbl_dir = None
    if "or_plbl" in cfg.loader:
        # or_plbl: previous round's saved pseudo-labels join the multi-hot
        # sample; directory derived from the resume checkpoint exactly like
        # stage 2 (region_cityscapes_or_plbl.py:17-23). Keyed on 'or_plbl'
        # so the stage-2 non-or 'region_plbl' loader does not trip it.
        from mulactseg_tpu.plbl.generator import plbl_save_dir

        if not cfg.resume_checkpoint:
            raise ValueError(
                "loader '%s' needs --resume-checkpoint to locate the "
                "plbl_gen round directory" % cfg.loader)
        plbl_dir = plbl_save_dir(cfg.resume_checkpoint, cfg.plbl_type,
                                 f"{cfg.init_iteration:02d}")
    label = RegionDatasetOr(cfg, cfg.trg_datalist, cfg.region_dict,
                            split="active-label", transform=train_tf,
                            encode_fn=encode,
                            # 'woignore' must NOT trip the substring test:
                            # or_oracle_woignore keeps 255 in spmask AND in
                            # the oracle labels (region_cityscapes_or_
                            # oracle_woignore.py:41-44)
                            ignore_gt_in_spmask="ignore" in cfg.loader
                            and "woignore" not in cfg.loader,
                            load_smaller_spx=cfg.load_smaller_spx or
                            "hier" in cfg.method or
                            cfg.method.endswith("_mseg"),
                            async_views="async" in cfg.loader,
                            async_weak_hflip="asyncv2" in cfg.loader,
                            weak_size=weak_size,
                            multihot_transform=mh_transform,
                            oracle_labels="oracle" in cfg.loader,
                            oracle_keep_ignore="woignore" in cfg.loader,
                            plbl_dir=plbl_dir)
    pool = RegionDatasetOr(cfg, cfg.trg_datalist, cfg.region_dict,
                           split="active-ulabel", transform=None,
                           encode_fn=encode,
                           multi_hot_cls=label.multi_hot_cls)
    label.suppix = {}
    label.im_idx = []
    if stats_mode is not None:
        label = _wrap_stats(cfg, label, stats_mode)
    val = _build_val_dataset(cfg, encode)
    return RegionActiveSet(cfg, pool, label), val


def _wrap_stats(cfg, label, stats_mode):
    """Analysis one-off loaders (region_cityscapes_{count_all,
    visualize_minor,dom_w_gt,dominant_all_sample}.py) keyed by the
    reference loader name; wraps whichever base (Or / dominant) the
    labeling arm built."""
    from mulactseg_tpu.data.stats import RegionStatsDataset

    return RegionStatsDataset(
        cfg, label, stats_mode,
        pred_ignore="predignore" in (cfg.resume_checkpoint or "")
        or "predignore" in cfg.method,
        seed=cfg.seed)


def _build_dominant_datasets(cfg, encode, stats_mode=None):
    """Dominant-labeling baseline arm (--no-or-labeling): the reference's
    non-Or branch (dataloader/__init__.py:143-145) over RegionCityscapes /
    _predignore / _withgt / _oracle. Label paths must point at offline
    gtFine_dominant* PNGs (tools/label_assignment generators)."""
    from mulactseg_tpu.data.datasets import RegionDatasetDominant
    from mulactseg_tpu.data.transforms import PairedTransform

    with_gt = "withgt" in cfg.loader
    pred_ignore = ("predignore" in cfg.loader
                   or "predignore" in cfg.method)
    pads = [cfg.ignore_idx, cfg.nseg] + ([cfg.ignore_idx] if with_gt
                                         else [])
    train_tf = PairedTransform(scale_range=(0.5, 2.0),
                               crop_size=tuple(cfg.crop_size),
                               pad_values=pads, hflip=True, seed=cfg.seed)
    label = RegionDatasetDominant(
        cfg, cfg.trg_datalist, cfg.region_dict, split="active-label",
        transform=train_tf, encode_fn=encode, pred_ignore=pred_ignore,
        with_gt=with_gt, full_supervision="oracle" in cfg.loader)
    pool = RegionDatasetDominant(
        cfg, cfg.trg_datalist, cfg.region_dict, split="active-ulabel",
        transform=None, encode_fn=encode)
    if stats_mode is not None:
        # the reference selects the stats loaders with or_labeling unset
        # (figure7 Dom scripts) — the analysis wrapper rides the dominant
        # base's im_idx/suppix/transform
        label = _wrap_stats(cfg, label, stats_mode)
    return RegionActiveSet(cfg, pool, label), _build_val_dataset(cfg, encode)


def _build_val_dataset(cfg, encode):
    """val dataset; gta5 shares the cityscapes LUT (dataset.py
    CityscapesGTA5.encode_target), synthia uses its own LUT + 16-bit
    label reader (dataset.py SYNTHIA)."""
    from mulactseg_tpu.data.datasets import encode_synthia, open_label_synthia

    val_list = cfg.val_datalist or os.path.join(cfg.datalist_dir, "val.txt")
    if not os.path.exists(val_list):
        if cfg.val_datalist:
            # an explicitly requested list must not silently disable
            # validation for a whole run
            raise FileNotFoundError(
                f"--val_datalist {cfg.val_datalist!r} does not exist")
        return None
    label_opener = None
    if cfg.dataset == "synthia":
        encode = encode_synthia
        label_opener = open_label_synthia
    elif cfg.dataset == "gta5":
        encode = encode_cityscapes
    return ValDataset(cfg, val_list, transform=get_val_transform(cfg),
                      encode_fn=encode, label_opener=label_opener)


def _build_mseg_datasets(cfg, encode):
    """Mixed-scale loader wiring (mseg_region_cityscapes.py:77-87 datalist
    substitution: each level's datalist/dict path is the previous level's
    with the nseg token swapped)."""
    from mulactseg_tpu.active.mseg_active_set import MsegRegionActiveSet
    from mulactseg_tpu.data.datasets import RegionDatasetMseg
    from mulactseg_tpu.data.transforms import PairedTransform

    levels = sorted(int(n) for n in cfg.nseg_list)
    if not levels:
        raise ValueError("mseg loader requires --nseg-list")
    datalists, region_dicts = {}, {}
    dl, rd, cur = cfg.trg_datalist, cfg.region_dict, str(cfg.nseg)
    for nseg in levels:
        dl = dl.replace(cur, str(nseg))
        rd = rd.replace(cur, str(nseg))
        cur = str(nseg)
        datalists[nseg], region_dicts[nseg] = dl, rd
    # per-level pad values: each spx map pads with its own nseg so padded
    # pixels can never alias a selected id (transform.py:62 pattern)
    train_tf = PairedTransform(scale_range=(0.5, 2.0),
                               crop_size=tuple(cfg.crop_size),
                               pad_values=levels, hflip=True, seed=cfg.seed)
    label = RegionDatasetMseg(cfg, datalists, region_dicts,
                              split="active-label", transform=train_tf,
                              encode_fn=encode)
    pool = RegionDatasetMseg(cfg, datalists, region_dicts,
                             split="active-ulabel", transform=None,
                             encode_fn=encode,
                             multi_hot_by_nseg=label.mseg_mh_cls)
    val = _build_val_dataset(cfg, encode)
    return MsegRegionActiveSet(cfg, pool, label, root=cfg.data_root), val


def setup_run(cfg):
    seed_everything(cfg.seed)
    os.makedirs(cfg.model_save_dir, exist_ok=True)
    logger = get_file_logger(cfg.model_save_dir)
    # --dontlog turns the wandb mirror off (train_AL.py:102-108 wandb
    # dryrun); the JSONL sink is always on
    sink = MetricsSink(cfg.model_save_dir,
                       use_wandb=cfg.use_wandb and not cfg.dontlog,
                       wandb_kwargs={"name": cfg.session_name or None,
                                     "tags": list(cfg.wandb_tags) or None,
                                     "group": cfg.wandb_group or None})
    return logger, sink
