"""Build-on-demand native kernels for the loader's hot item path.

`lib()` compiles resample.cpp once (g++ -O3, cached by source hash under
/tmp) and returns a ctypes handle, or None when native is disabled
(MULACTSEG_NATIVE=0) or the toolchain is missing — every caller falls
back to the numpy/PIL path in that case, so the package works without a
compiler. ctypes releases the GIL for the duration of each call, so the
DataProvider thread pool scales these kernels across host cores (the
same reason the reference's torch DataLoader uses worker processes,
dataloader/utils.py:28-62).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "resample.cpp")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


# -ffp-contract=off: the coefficient math is double-precision and must
# round exactly like PIL's (no-FMA) build — contraction shifts ~1e-4 of
# box-resample pixels by 1 LSB via off-by-one fixed-point coefficients
_FLAGS = ["-O3", "-march=native", "-ffp-contract=off", "-std=c++17",
          "-fPIC", "-shared"]


def _build() -> str:
    src = open(_SRC, "rb").read()
    tag = hashlib.sha256(src + " ".join(_FLAGS).encode()).hexdigest()[:16]
    out = f"/tmp/mulactseg_native_{tag}.so"
    if os.path.exists(out):
        return out
    tmp = f"{out}.{os.getpid()}.tmp"
    subprocess.run(["g++", *_FLAGS, _SRC, "-o", tmp],
                   check=True, capture_output=True)
    os.replace(tmp, out)  # atomic: concurrent builders race safely
    return out


def lib():
    """The loaded native library, or None (fallback to numpy/PIL)."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("MULACTSEG_NATIVE", "1") == "0":
            return None
        try:
            L = ctypes.CDLL(_build())
        except Exception:
            return None
        i8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        u16p = ctypes.POINTER(ctypes.c_uint16)
        L.resize_bilinear_u8.argtypes = [
            i8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, i8p, ctypes.c_int, ctypes.c_int]
        L.resize_bilinear_u8.restype = ctypes.c_int
        L.gather2d_i32.argtypes = [i32p, ctypes.c_int64, i64p, i64p,
                                   ctypes.c_int64, ctypes.c_int64, i32p]
        L.gather2d_u8.argtypes = [i8p, ctypes.c_int64, i64p, i64p,
                                  ctypes.c_int64, ctypes.c_int64, i32p]
        L.lut_f32.argtypes = [i8p, ctypes.c_int64, ctypes.c_int64,
                              ctypes.c_int64, f32p, f32p, ctypes.c_int]
        L.lut_u16.argtypes = [i8p, ctypes.c_int64, ctypes.c_int64,
                              ctypes.c_int64, u16p, u16p, ctypes.c_int]
        L.flip_copy_u8.argtypes = [i8p, ctypes.c_int64, ctypes.c_int64,
                                   ctypes.c_int64, i8p, ctypes.c_int]
        L.bits_lookup.argtypes = [i32p, i8p, i64p, ctypes.c_int64,
                                  ctypes.c_int64, i32p]
        for fn in (L.gather2d_i32, L.gather2d_u8, L.lut_f32, L.lut_u16,
                   L.flip_copy_u8, L.bits_lookup):
            fn.restype = None
        _LIB = L
        return _LIB


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def resize_bilinear_u8(img: np.ndarray, size_hw, box=None) -> np.ndarray:
    """Byte-exact twin of PIL BILINEAR resize(+box) for uint8 HxW[xC]."""
    L = lib()
    assert L is not None
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    img = np.ascontiguousarray(img)
    H, W, C = img.shape
    oh, ow = int(size_hw[0]), int(size_hw[1])
    if box is None:
        box = (0.0, 0.0, float(W), float(H))
    out = np.empty((oh, ow, C), np.uint8)
    rc = L.resize_bilinear_u8(
        _ptr(img, ctypes.c_uint8), H, W, C, float(box[0]), float(box[1]),
        float(box[2]), float(box[3]), _ptr(out, ctypes.c_uint8), oh, ow)
    assert rc == 0
    return out[:, :, 0] if squeeze else out


def gather2d(src: np.ndarray, yi: np.ndarray, xi: np.ndarray) -> np.ndarray:
    """out[i, j] = src[yi[i], xi[j]] as int32 (labels are int32 downstream)."""
    L = lib()
    assert L is not None
    src = np.ascontiguousarray(src)
    yi = np.ascontiguousarray(yi, np.int64)
    xi = np.ascontiguousarray(xi, np.int64)
    out = np.empty((yi.size, xi.size), np.int32)
    if src.dtype == np.uint8:
        L.gather2d_u8(_ptr(src, ctypes.c_uint8), src.shape[1],
                      _ptr(yi, ctypes.c_int64), _ptr(xi, ctypes.c_int64),
                      yi.size, xi.size, _ptr(out, ctypes.c_int32))
    else:
        src32 = np.ascontiguousarray(src, np.int32)
        L.gather2d_i32(_ptr(src32, ctypes.c_int32), src32.shape[1],
                       _ptr(yi, ctypes.c_int64), _ptr(xi, ctypes.c_int64),
                       yi.size, xi.size, _ptr(out, ctypes.c_int32))
    return out


def lut_normalize(img_u8: np.ndarray, lut: np.ndarray,
                  flip: bool = False) -> np.ndarray:
    """Fused optional-hflip + per-channel LUT gather; lut is (256, C) in
    f32 or bf16 (16-bit entries pass through as raw bit patterns)."""
    L = lib()
    assert L is not None
    img_u8 = np.ascontiguousarray(img_u8)
    H, W, C = img_u8.shape
    assert lut.shape == (256, C)
    if lut.dtype == np.float32:
        out = np.empty((H, W, C), np.float32)
        L.lut_f32(_ptr(img_u8, ctypes.c_uint8), H, W, C,
                  _ptr(lut, ctypes.c_float), _ptr(out, ctypes.c_float),
                  int(flip))
        return out
    assert lut.dtype.itemsize == 2
    lut16 = np.ascontiguousarray(lut).view(np.uint16)
    out = np.empty((H, W, C), np.uint16)
    L.lut_u16(_ptr(img_u8, ctypes.c_uint8), H, W, C,
              _ptr(lut16, ctypes.c_uint16), _ptr(out, ctypes.c_uint16),
              int(flip))
    return out.view(lut.dtype)


def flip_copy_u8(img_u8: np.ndarray, flip: bool = False) -> np.ndarray:
    L = lib()
    assert L is not None
    img_u8 = np.ascontiguousarray(img_u8)
    H, W, C = img_u8.shape
    out = np.empty_like(img_u8)
    L.flip_copy_u8(_ptr(img_u8, ctypes.c_uint8), H, W, C,
                   _ptr(out, ctypes.c_uint8), int(flip))
    return out


def bits_lookup(spx: np.ndarray, mask: np.ndarray,
                seg_bits: np.ndarray) -> np.ndarray:
    """pixel_target_bits tail: per-pixel candidate-bitmask lookup."""
    L = lib()
    assert L is not None
    spx = np.ascontiguousarray(spx, np.int32)
    mask = np.ascontiguousarray(mask)
    mask = (mask.view(np.uint8) if mask.dtype == np.bool_
            else mask.astype(np.uint8))
    seg_bits = np.ascontiguousarray(seg_bits, np.int64)
    out = np.empty(spx.shape, np.int32)
    L.bits_lookup(_ptr(spx, ctypes.c_int32), _ptr(mask, ctypes.c_uint8),
                  _ptr(seg_bits, ctypes.c_int64), spx.size, seg_bits.size,
                  _ptr(out, ctypes.c_int32))
    return out
