"""Native loader kernels (mulactseg_tpu/native) vs their numpy/PIL twins.

The C++ resample must be BYTE-identical to PIL's uint8 bilinear resize
(incl. box= windows) — it replaces PIL inside data/transforms.resize_image,
so any divergence would silently change every training crop. The gather /
LUT / bitmask kernels replace pure-numpy code and must match exactly.
"""

import numpy as np
import pytest
from PIL import Image

from mulactseg_tpu import native


pytestmark = pytest.mark.skipif(
    native.lib() is None, reason="native toolchain unavailable")


def test_resize_bilinear_matches_pil_exactly():
    rng = np.random.RandomState(0)
    for _ in range(60):
        H, W = rng.randint(2, 300), rng.randint(2, 300)
        C = int(rng.choice([1, 3]))
        oh, ow = rng.randint(1, 320), rng.randint(1, 320)
        img = rng.randint(0, 256, (H, W, C) if C == 3 else (H, W)).astype(
            np.uint8)
        if rng.rand() < 0.6:
            x0 = rng.uniform(0, W - 1)
            y0 = rng.uniform(0, H - 1)
            box = (x0, y0, rng.uniform(x0 + 0.5, W), rng.uniform(y0 + 0.5, H))
        else:
            box = None
        ref = np.asarray(
            Image.fromarray(img).resize((ow, oh), Image.BILINEAR, box=box))
        got = native.resize_bilinear_u8(img, (oh, ow), box=box)
        np.testing.assert_array_equal(got, ref, err_msg=str(
            (H, W, C, oh, ow, box)))


def test_resize_recipe_shapes_exact():
    # the train fast path's real shapes: crop-window box resample at
    # scales 0.5-2.0 from a 1024x2048 source window to a 768^2 crop
    rng = np.random.RandomState(1)
    for s in (0.5, 0.77, 1.0, 1.31, 2.0):
        win = rng.randint(0, 256, (int(770 / s) + 4, int(770 / s) + 4, 3)
                          ).astype(np.uint8)
        H, W = win.shape[:2]
        box = (1.3, 2.7, 1.3 + (W - 4) * 0.98, 2.7 + (H - 4) * 0.98)
        ref = np.asarray(Image.fromarray(win).resize(
            (768, 768), Image.BILINEAR, box=box))
        got = native.resize_bilinear_u8(win, (768, 768), box=box)
        np.testing.assert_array_equal(got, ref)


def test_gather2d_matches_fancy_indexing():
    rng = np.random.RandomState(2)
    for dt in (np.int32, np.uint8):
        src = rng.randint(0, 200, (123, 215)).astype(dt)
        yi = rng.randint(0, 123, 77)
        xi = rng.randint(0, 215, 91)
        ref = src[yi[:, None], xi[None, :]].astype(np.int32)
        np.testing.assert_array_equal(native.gather2d(src, yi, xi), ref)


def test_lut_normalize_matches_python_lut():
    import ml_dtypes

    from mulactseg_tpu.data.transforms import _norm_lut_for

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (64, 97, 3)).astype(np.uint8)
    for dt in (np.float32, ml_dtypes.bfloat16):
        lut = _norm_lut_for(dt)
        ref = np.empty(img.shape, dt)
        for c in range(3):
            ref[..., c] = lut[img[..., c], c]
        got = native.lut_normalize(img, lut)
        np.testing.assert_array_equal(
            got.view(np.uint8), np.ascontiguousarray(ref).view(np.uint8))
        got_f = native.lut_normalize(img, lut, flip=True)
        np.testing.assert_array_equal(
            got_f.view(np.uint8),
            np.ascontiguousarray(ref[:, ::-1]).view(np.uint8))


def test_flip_copy_u8():
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (33, 57, 3)).astype(np.uint8)
    np.testing.assert_array_equal(native.flip_copy_u8(img, False), img)
    np.testing.assert_array_equal(native.flip_copy_u8(img, True),
                                  img[:, ::-1])


def test_bits_lookup_matches_numpy():
    rng = np.random.RandomState(5)
    S = 40
    seg_bits = rng.randint(0, 1 << 20, S).astype(np.int64)
    spx = rng.randint(0, S + 3, (50, 60)).astype(np.int32)  # incl. pad ids
    mask = rng.rand(50, 60) < 0.5
    ref = (seg_bits[np.minimum(spx, S - 1)] * mask).astype(np.int32)
    np.testing.assert_array_equal(native.bits_lookup(spx, mask, seg_bits),
                                  ref)


def test_pixel_target_bits_native_path():
    from mulactseg_tpu.losses.fused import pixel_target_bits

    rng = np.random.RandomState(6)
    S, C = 32, 20
    target = (rng.rand(S, C) < 0.3).astype(np.float32)
    spx = rng.randint(0, S + 1, (41, 53)).astype(np.int32)
    spmask = rng.rand(41, 53) < 0.6
    got = pixel_target_bits(target, spx, spmask)
    weights = 1 << np.arange(C, dtype=np.int64)
    seg_bits = ((target > 0.5).astype(np.int64) * weights).sum(-1)
    ref = (seg_bits[np.minimum(spx, S - 1)] * spmask).astype(np.int32)
    np.testing.assert_array_equal(got, ref)


def test_paired_transform_native_equals_python(monkeypatch):
    """The full train transform (scale+crop+flip+normalize) with native
    kernels is byte-identical to the numpy/PIL path — same RNG draws,
    same PIL sampling arithmetic, same LUT."""
    import ml_dtypes

    from mulactseg_tpu.data import transforms as T

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (200, 300, 3)).astype(np.uint8)
    gt = rng.randint(0, 19, (200, 300)).astype(np.uint8)
    spx = rng.randint(0, 64, (200, 300)).astype(np.int32)

    def run(native_on, **kw):
        if not native_on:
            monkeypatch.setattr(native, "lib", lambda: None)
        else:
            monkeypatch.undo()
        tr = T.PairedTransform(scale_range=(0.5, 2.0), crop_size=(96, 96),
                               pad_values=[255, 64], hflip=True, seed=11,
                               **kw)
        outs = [tr(img, [gt, spx]) for _ in range(6)]
        return outs

    for kw in ({}, {"emit_u8": True}, {"out_dtype": ml_dtypes.bfloat16}):
        ref = run(False, **kw)
        got = run(True, **kw)
        for (ri, rl), (gi, gl) in zip(ref, got):
            np.testing.assert_array_equal(
                np.asarray(gi).view(np.uint8), np.asarray(ri).view(np.uint8))
            for a, b in zip(rl, gl):
                np.testing.assert_array_equal(b, a)


def test_val_identity_transform_native_equals_python(monkeypatch):
    from mulactseg_tpu.data import transforms as T

    rng = np.random.RandomState(8)
    img = rng.randint(0, 256, (128, 256, 3)).astype(np.uint8)
    gt = rng.randint(0, 19, (128, 256)).astype(np.uint8)

    monkeypatch.setattr(native, "lib", lambda: None)
    ref_i, ref_l = T.PairedTransform(seed=0)(img, [gt])
    monkeypatch.undo()
    got_i, got_l = T.PairedTransform(seed=0)(img, [gt])
    np.testing.assert_array_equal(got_i, ref_i)
    np.testing.assert_array_equal(got_l[0], ref_l[0])
