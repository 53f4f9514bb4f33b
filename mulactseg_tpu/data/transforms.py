"""Paired image+label-list transforms (host side, numpy/PIL).

Re-implementation of the reference's ext_transforms pipeline
(/root/reference/dataloader/ext_transforms.py) with the same semantics:
random scale (0.5-2.0, bilinear image / nearest labels), random crop with
*per-label pad values* (ignore_idx for GT, nseg for superpixel maps —
dataloader/transform.py:62), horizontal flip, ImageNet normalization.
Images come out NHWC float32 — TPU-native layout.

The named-transform registry mirrors dataloader/transform.py:5-171 /
transform_voc.py.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from mulactseg_tpu.data.constants import IMAGENET_MEAN, IMAGENET_STD


def _to_pil(img) -> Image.Image:
    if isinstance(img, Image.Image):
        return img
    # fromarray on a non-contiguous view (the _scaled_crop window slice)
    # falls into PIL's slow tobytes() serialization (~15 ms/item at
    # recipe shapes); a numpy strided memcpy first lets PIL wrap the
    # buffer directly (same values, ~4x faster)
    return Image.fromarray(np.ascontiguousarray(img))


def resize_image(img: np.ndarray, size_hw: Tuple[int, int],
                 nearest: bool = False,
                 box: Optional[Tuple[float, float, float, float]] = None
                 ) -> np.ndarray:
    """PIL resize; `box` (x0, y0, x1, y1 in source coords) resizes just
    that source window — PIL samples output pixel centers linearly over
    the box and clamps filter taps at the true image edges, so
    resize(size, box=b) computes the same sampling grid as full resize +
    crop. NOT bit-identical: PIL evaluates centers with different float
    rounding per path (incremental accumulation in the C affine loop), so
    exact-tie pixels differ — ±1-2 uint8 LSB on up to ~10% of bilinear
    pixels at downscales (pinned <12% with max 2 LSB by
    tests/test_data_formats.py::test_box_resize_matches_resize_then_crop).
    Nearest-tie jitter would flip label pixels, so the train fast path
    does NOT use box nearest for labels — see _scaled_crop."""
    if box is None and img.shape[:2] == tuple(size_hw):
        # same-size bilinear/nearest resample is the identity; Cityscapes
        # val hits this on every image (resize 1024x2048 -> 1024x2048)
        return img
    if not nearest and img.dtype == np.uint8:
        from mulactseg_tpu import native

        if native.lib() is not None:
            # byte-exact PIL twin (tests/test_native_transform.py), one
            # GIL-released C++ pass, no PIL buffer copies
            return native.resize_bilinear_u8(img, size_hw, box=box)
    mode = Image.NEAREST if nearest else Image.BILINEAR
    pil = _to_pil(img if img.dtype != np.int32 else img.astype(np.int32))
    if nearest and img.dtype not in (np.uint8,):
        # PIL handles int32 via mode "I"
        pil = Image.fromarray(img.astype(np.int32), mode="I")
    out = pil.resize((size_hw[1], size_hw[0]), mode, box=box)
    return np.asarray(out)


def _pil_nearest_index(n_src: int, n_out: int) -> np.ndarray:
    """Source index per output position of a PIL NEAREST full resize.

    PIL's C affine loop accumulates the sampling center sequentially
    (x = a1*0.5; x += a1 per pixel) and truncates, so exact-tie pixels
    depend on the accumulated float rounding — replicated here addition
    by addition (verified exact on random shapes in
    tests/test_data_formats.py::test_pil_nearest_index_exact)."""
    a1 = n_src / n_out
    xs = np.empty(n_out)
    x = a1 * 0.5
    for k in range(n_out):
        xs[k] = x
        x += a1
    return np.minimum(xs.astype(np.int64), n_src - 1)


# uint8 -> normalized float32 as a 256-entry per-channel table: the same
# float ops evaluated on every possible byte, so the gather is
# bit-identical to the arithmetic path below — and ~3x faster (the train
# loader normalizes a 768^2 crop per item)
_NORM_LUT = ((np.arange(256, dtype=np.float32)[:, None] / 255.0
              - IMAGENET_MEAN) / IMAGENET_STD).astype(np.float32)
_NORM_LUTS = {np.dtype(np.float32): _NORM_LUT}


def _norm_lut_for(dtype) -> np.ndarray:
    dt = np.dtype(dtype)
    lut = _NORM_LUTS.get(dt)
    if lut is None:
        lut = _NORM_LUT.astype(dt)
        _NORM_LUTS[dt] = lut
    return lut


def normalize(img_u8: np.ndarray, dtype=np.float32) -> np.ndarray:
    """dtype: emit the normalized image in this dtype directly. A bf16
    LUT (the f32 table value-rounded once) makes the gather produce
    exactly what normalize(f32).astype(bf16) would — but in ONE pass
    with half the write bytes, and the trainer's bf16 post hook then
    skips its own full-array cast."""
    lut = _norm_lut_for(dtype)
    dt = lut.dtype
    if img_u8.dtype == np.uint8 and img_u8.ndim == 3 and \
            img_u8.shape[-1] == lut.shape[1]:
        from mulactseg_tpu import native

        if native.lib() is not None and img_u8.flags.c_contiguous:
            # same table, same gather, one GIL-released C pass
            return native.lut_normalize(img_u8, lut)
        out = np.empty(img_u8.shape, dt)
        for c in range(lut.shape[1]):
            out[..., c] = lut[img_u8[..., c], c]
        return out
    x = img_u8.astype(np.float32) / 255.0
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return x if dt == np.float32 else x.astype(dt)


def train_out_dtype(cfg):
    """Host-side image dtype for train transforms: bf16 when the model
    computes in bf16 (halves transfer AND the LUT write) unless the
    loader ships uint8 (normalization then happens on device)."""
    if (getattr(cfg, "dtype", "") == "bfloat16"
            and not getattr(cfg, "ship_uint8", False)):
        import ml_dtypes

        return ml_dtypes.bfloat16
    return np.float32


class PairedTransform:
    """transform(image_u8 HxWx3, labels: list of HxW int arrays) ->
    (float32 HxWx3, [int32 HxW, ...])."""

    def __init__(self, *, scale_range: Optional[Tuple[float, float]] = None,
                 crop_size: Optional[Tuple[int, int]] = None,
                 pad_values: Sequence[int] = (),
                 img_pad: Tuple[int, int, int] = (124, 116, 104),
                 hflip: bool = False,
                 resize_to: Optional[Tuple[int, int]] = None,
                 emit_u8: bool = False,
                 out_dtype=np.float32,
                 seed: int = 0):
        self.scale_range = scale_range
        self.crop_size = crop_size
        self.pad_values = list(pad_values)
        self.img_pad = img_pad
        self.hflip = hflip
        self.resize_to = resize_to
        # skip host normalization, hand the uint8 crop through (the train
        # step normalizes on device when it sees a uint8 batch)
        self.emit_u8 = emit_u8
        self.out_dtype = out_dtype
        self.rng = np.random.RandomState(seed)

    def __call__(self, image: np.ndarray, labels: List[np.ndarray]):
        image = np.asarray(image)
        labels = [np.asarray(l) for l in labels]

        if self.resize_to is not None:
            image = resize_image(image, self.resize_to)
            labels = [resize_image(l, self.resize_to, nearest=True)
                      for l in labels]

        if self.scale_range is not None and self.crop_size is not None:
            # train fast path: resize ONLY the crop window via PIL's box
            # resample (a scale-2.0 full resize produces 8.4 MP x 3 and
            # throws 93% of it away; the box path does ~7% of that work).
            # Same RNG draw order (s, y0, x0, flip) as the generic path
            # below; image and labels share one sampling grid, differing
            # from the materializing path only by exact-tie rounding (see
            # resize_image docstring).
            image, labels = self._scaled_crop(image, labels)
            return self._finish(image, labels)

        if self.scale_range is not None:
            s = self.rng.uniform(*self.scale_range)
            h, w = image.shape[:2]
            nh, nw = int(round(h * s)), int(round(w * s))
            image = resize_image(image, (nh, nw))
            labels = [resize_image(l, (nh, nw), nearest=True) for l in labels]

        if self.crop_size is not None:
            ch, cw = self.crop_size
            h, w = image.shape[:2]
            if h < ch or w < cw:  # pad_if_needed with per-label values
                image, labels = self._pad_to(image, labels, ch, cw)
                h, w = image.shape[:2]
            y0 = self.rng.randint(0, h - ch + 1)
            x0 = self.rng.randint(0, w - cw + 1)
            image = image[y0:y0 + ch, x0:x0 + cw]
            labels = [l[y0:y0 + ch, x0:x0 + cw] for l in labels]

        return self._finish(image, labels)

    def _scaled_crop(self, image, labels):
        """Random scale + pad-if-needed + random crop without ever
        materializing the scaled full image."""
        s = self.rng.uniform(*self.scale_range)
        h0, w0 = image.shape[:2]
        nh, nw = int(round(h0 * s)), int(round(w0 * s))
        ch, cw = self.crop_size
        # padded extent the generic path would crop from
        h, w = max(nh, ch), max(nw, cw)
        y0 = self.rng.randint(0, h - ch + 1)
        x0 = self.rng.randint(0, w - cw + 1)
        # crop window ∩ resized extent (the rest is bottom/right padding)
        oh, ow = min(ch, nh - y0), min(cw, nw - x0)
        sy, sx = h0 / nh, w0 / nw
        box = (x0 * sx, y0 * sy, (x0 + ow) * sx, (y0 + oh) * sy)
        # slice the source down to the window the filter can actually
        # read (box + bilinear support, which scales as max(s, 1) on
        # downscales, + rounding slack): PIL's fromarray copies its whole
        # input, so handing it the full image costs a full-image copy per
        # item. Integer window shift => identical sampling arithmetic.
        mgx, mgy = int(np.ceil(max(sx, 1.0))) + 2, int(np.ceil(max(sy, 1.0))) + 2
        wx0 = max(int(np.floor(box[0])) - mgx, 0)
        wy0 = max(int(np.floor(box[1])) - mgy, 0)
        wx1 = min(int(np.ceil(box[2])) + mgx, w0)
        wy1 = min(int(np.ceil(box[3])) + mgy, h0)
        image = resize_image(image[wy0:wy1, wx0:wx1], (oh, ow),
                             box=(box[0] - wx0, box[1] - wy0,
                                  box[2] - wx0, box[3] - wy0))
        # labels: numpy gather over the EXACT full-resize nearest grid —
        # byte-identical to the materializing path (GT/superpixel ids get
        # no tie jitter; only the bilinear image carries ±LSB noise)
        yi = _pil_nearest_index(h0, nh)[y0:y0 + oh]
        xi = _pil_nearest_index(w0, nw)[x0:x0 + ow]
        from mulactseg_tpu import native

        if native.lib() is not None and all(
                l.dtype in (np.uint8, np.int32) for l in labels):
            # same gather in one C pass, emitting the int32 the collate
            # path needs anyway
            labels = [native.gather2d(l, yi, xi) for l in labels]
        else:
            labels = [l[yi[:, None], xi[None, :]] for l in labels]
        if oh < ch or ow < cw:
            image, labels = self._pad_to(image, labels, ch, cw)
        return image, labels

    def _pad_to(self, image, labels, ch, cw):
        """Bottom/right pad to (ch, cw): image with img_pad per channel,
        each label with its own pad value (dataloader/transform.py:62)."""
        h, w = image.shape[:2]
        ph, pw = max(ch - h, 0), max(cw - w, 0)
        image = np.pad(image, ((0, ph), (0, pw), (0, 0)),
                       constant_values=0)
        for c in range(3):
            image[h:, :, c] = self.img_pad[c]
            image[:, w:, c] = self.img_pad[c]
        labels = [np.pad(l, ((0, ph), (0, pw)),
                         constant_values=self.pad_values[i]
                         if i < len(self.pad_values) else 255)
                  for i, l in enumerate(labels)]
        return image, labels

    def _finish(self, image, labels):
        # same RNG consumption as the numpy path: one draw, only if hflip
        flip = bool(self.hflip and self.rng.rand() < 0.5)
        if flip:
            labels = [l[:, ::-1] for l in labels]

        from mulactseg_tpu import native

        if (native.lib() is not None and image.dtype == np.uint8
                and image.ndim == 3 and image.shape[-1] == 3
                and image.flags.c_contiguous):
            # fused (flip +) LUT-normalize / contiguous copy: one C pass
            # instead of flip view -> ascontiguousarray -> LUT gathers
            image = (native.flip_copy_u8(image, flip) if self.emit_u8 else
                     native.lut_normalize(image, _norm_lut_for(self.out_dtype),
                                          flip))
        else:
            if flip:
                image = image[:, ::-1]
            image = np.ascontiguousarray(image)
            if not self.emit_u8:
                image = normalize(image, self.out_dtype)
        labels = [np.ascontiguousarray(l).astype(np.int32) for l in labels]
        return image, labels


def get_train_transform(name: str, cfg, seed: int = 0) -> PairedTransform:
    """Named registry (dataloader/transform.py:5-171)."""
    crop = tuple(cfg.crop_size)
    u8 = getattr(cfg, "ship_uint8", False)
    odt = train_out_dtype(cfg)
    if name in ("rescale_769_multi_notrg", "rescale_513_multi_notrg"):
        # train: image + [spx]; pad spx with nseg
        return PairedTransform(scale_range=(0.5, 2.0), crop_size=crop,
                               pad_values=[cfg.nseg], hflip=True,
                               emit_u8=u8, out_dtype=odt, seed=seed)
    if name in ("rescale_769_multi_ignore_notrg",
                "rescale_513_multi_ignore_notrg"):
        # _ignore loaders: image + [GT, spx]; per-label pad values
        # (dataloader/transform.py:62 pattern)
        return PairedTransform(scale_range=(0.5, 2.0), crop_size=crop,
                               pad_values=[cfg.ignore_idx, cfg.nseg],
                               hflip=True, emit_u8=u8, out_dtype=odt,
                               seed=seed)
    if name in ("rescale_769_nospx", "rescale_513_notrg"):
        # stage-2: image + [plbl GT]; pad with ignore
        return PairedTransform(scale_range=(0.5, 2.0), crop_size=crop,
                               pad_values=[cfg.ignore_idx], hflip=True,
                               emit_u8=u8, out_dtype=odt, seed=seed)
    if name == "eval_spx" or name == "eval_spx_identity":
        return PairedTransform(seed=seed)  # identity + normalize
    raise KeyError(f"unknown transform {name!r}")


def get_val_transform(cfg, seed: int = 0) -> PairedTransform:
    """Cityscapes val: resize 1024x2048; VOC val handled by its dataset
    (dataloader/__init__.py:38-55)."""
    if cfg.dataset == "cityscapes":
        return PairedTransform(resize_to=(1024, 2048), seed=seed)
    return PairedTransform(seed=seed)
