"""Synthetic in-memory fixture dataset.

Serves the role of the reference's Cityscapes/VOC assets for tests and
benchmarks: blobby GT label maps, grid superpixels, and the derived
multi-hot per-superpixel annotations (the offline product of
/root/reference/tools/label_assignment_tensor.py:50-67), exposed through
the same region-dataset API surface (im_idx / suppix / multi_hot_cls /
id_to_index) that the active-learning state machinery mutates
(dataloader/region_cityscapes_or_tensor.py:16-96).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np

from mulactseg_tpu.data.transforms import PairedTransform, normalize


def _blobby_labels(rng, H, W, num_classes, cells=4):
    grid = rng.randint(0, num_classes, size=(cells, cells)).astype(np.uint8)
    ys = (np.arange(H) * cells // H)
    xs = (np.arange(W) * cells // W)
    return grid[np.ix_(ys, xs)]


def grid_superpixels(H: int, W: int, nseg: int) -> np.ndarray:
    """Regular-grid superpixels: ids 0..nseg-1 tiling the image."""
    g = int(math.floor(math.sqrt(nseg)))
    gy = g
    gx = nseg // g
    ys = np.minimum((np.arange(H) * gy // H), gy - 1)
    xs = np.minimum((np.arange(W) * gx // W), gx - 1)
    return (ys[:, None] * gx + xs[None, :]).astype(np.int32)


def multi_hot_from_gt(gt: np.ndarray, spx: np.ndarray, nseg: int,
                      num_classes: int, ignore_idx: int = 255) -> np.ndarray:
    """(S, C+1) multi-hot of classes present per superpixel; ignore pixels
    feed the last channel (dataloader/region_cityscapes_tensor.py:41-84)."""
    out = np.zeros((nseg, num_classes + 1), np.float32)
    g = np.where(gt == ignore_idx, num_classes, gt).astype(np.int64)
    flat_idx = spx.reshape(-1) * (num_classes + 1) + g.reshape(-1)
    counts = np.bincount(flat_idx, minlength=nseg * (num_classes + 1))
    out = (counts.reshape(nseg, num_classes + 1) > 0).astype(np.float32)
    return out


class SyntheticRegionDataset:
    """Pool/label/val dataset triple-compatible fixture.

    split: 'active-label' -> training items (images, target multi-hot, spx,
    spmask over selected superpixels); 'active-ulabel' -> pool items
    (images, spx); 'val' -> (images, GT labels).
    """

    def __init__(self, *, n_images=4, H=64, W=64, num_classes=5, nseg=16,
                 split="active-label", transform: Optional[PairedTransform] = None,
                 seed=0, ignore_frac=0.05, small_nseg=None, async_views=False):
        self.small_nseg = small_nseg
        self.async_views = async_views
        self.nseg = nseg
        self.num_classes = num_classes
        self.split = split
        self.transform = transform
        self.H, self.W = H, W
        rng = np.random.RandomState(seed)
        self.images = []
        self.gts = []
        spx_map = grid_superpixels(H, W, nseg)
        self.spx_map = spx_map
        self.spx_small_map = (grid_superpixels(H, W, small_nseg)
                              if small_nseg else None)
        mh = []
        self.im_idx: List[List[str]] = []
        self.suppix: Dict[str, List[int]] = {}
        self.id_to_index: Dict[str, int] = {}
        for i in range(n_images):
            img = rng.randint(0, 255, size=(H, W, 3)).astype(np.uint8)
            gt = _blobby_labels(rng, H, W, num_classes)
            ign = rng.rand(H, W) < ignore_frac
            gt = np.where(ign, 255, gt).astype(np.int32)
            self.images.append(img)
            self.gts.append(gt)
            mh.append(multi_hot_from_gt(gt, spx_map, nseg, num_classes))
            key = [f"img_{i}.png", f"lbl_{i}.png", f"spx_{i}.pkl"]
            self.im_idx.append(key)
            present = np.unique(spx_map).tolist()
            self.suppix[key[2]] = list(present)
            self.id_to_index[f"lbl_{i}"] = i
        self.multi_hot_cls = np.stack(mh)  # (N, S, C+1)
        self.isselected = np.zeros(self.multi_hot_cls.shape[:-1], np.float32)

    def __len__(self):
        return len(self.im_idx)

    def decode_target(self, t):
        return np.stack([t, t, t], -1).astype(np.uint8)

    def __getitem__(self, index):
        key = self.im_idx[index]
        gidx = self.id_to_index[key[1].split(".")[0]]
        img = self.images[gidx]
        gt = self.gts[gidx]
        spx = self.spx_map
        target = self.multi_hot_cls[gidx]

        if self.split == "val":
            if self.transform is not None:
                im, (g,) = self.transform(img, [gt])
            else:
                im, g = normalize(img), gt
            return {"images": im, "labels": g.astype(np.int32),
                    "fnames": key}

        if self.split == "active-ulabel":
            if self.transform is not None:
                im, (sp,) = self.transform(img, [spx])
            else:
                im, sp = normalize(img), spx
            return {"images": im, "spx": sp.astype(np.int32),
                    "labels": target, "fnames": key}

        # active-label (training)
        if self.transform is not None:
            im, (sp,) = self.transform(img, [spx])
        else:
            im, sp = normalize(img), spx
        selected = self.suppix.get(key[2], [])
        spmask = np.isin(sp, selected)
        sample = {"images": im, "labels": gt.astype(np.int32),
                  "target": target.astype(np.float32),
                  "spx": sp.astype(np.int32), "spmask": spmask,
                  "fnames": key}
        if target.shape[-1] <= 31:
            from mulactseg_tpu.losses.fused import pixel_target_bits

            sample["target_bits"] = pixel_target_bits(
                target, sp.astype(np.int32), spmask)
        if self.spx_small_map is not None:
            sample["spx_small"] = self.spx_small_map.astype(np.int32)
        if self.async_views:
            # weak view: un-augmented copy (ignore_async loader analogue)
            sample["images_weak"] = im
            sample["spx_weak"] = sample["spx"]
            sample["spmask_weak"] = spmask
            if self.spx_small_map is not None:
                sample["spx_small_weak"] = self.spx_small_map.astype(np.int32)
        return sample


def irregular_superpixels(H: int, W: int, nseg: int,
                          rng: "np.random.RandomState") -> np.ndarray:
    """Jittered-grid superpixels: contiguous irregular cells with
    SEEDS-like size statistics (the real maps are compact blobs of
    ~H*W/nseg pixels — raster runs of ~sqrt(H*W/nseg) px). Used by the
    benchmarks so synthetic data has the run structure the segment engine
    exploits; a per-pixel random map would benchmark a workload that
    never occurs."""
    gy = int(math.floor(math.sqrt(nseg)))
    gx = nseg // gy

    def bounds(n, size):
        w = 0.6 + 0.8 * rng.rand(n)
        edges = np.round(np.cumsum(w) / w.sum() * size).astype(np.int64)
        return np.concatenate([[0], edges])

    ybounds = bounds(gy, H)
    yband = np.zeros(H, np.int64)
    for i in range(gy):
        yband[ybounds[i]:ybounds[i + 1]] = i
    out = np.zeros((H, W), np.int32)
    for i in range(gy):
        xb = bounds(gx, W)
        xband = np.zeros(W, np.int64)
        for j in range(gx):
            xband[xb[j]:xb[j + 1]] = j
        rows = yband == i
        out[rows] = (i * gx + xband)[None, :]
    return out
