"""ctypes bindings for the native C++ host runtime (native/preprocess.cpp).

The library is built on demand with g++ (no pybind11 in this image); if
the toolchain or .so is unavailable everything degrades to the numpy
implementations in yolo_tpu.data.transforms.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

from yolo_tpu.config import BGR_MEAN, BGR_STD

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libyolo_tpu_native.so")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return True
    except Exception:
        return False


_ABI_VERSION = 4


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.yolo_tpu_version.restype = ctypes.c_int
    if lib.yolo_tpu_version() < _ABI_VERSION:
        # stale .so from an older source tree: rebuild and reload
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.yolo_tpu_version.restype = ctypes.c_int
        if lib.yolo_tpu_version() < _ABI_VERSION:
            return None
    lib.yolo_tpu_preprocess_batch.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),                  # frames
        ctypes.POINTER(ctypes.c_int),                     # ihs
        ctypes.POINTER(ctypes.c_int),                     # iws
        ctypes.c_int, ctypes.c_int, ctypes.c_int,         # n, oh, ow
        ctypes.POINTER(ctypes.c_float),                   # mean
        ctypes.POINTER(ctypes.c_float),                   # std
        ctypes.c_int,                                     # to_rgb
        ctypes.c_void_p, ctypes.c_void_p,                 # out f32 / i8
        ctypes.c_float,                                   # act_scale
    ]
    lib.yolo_tpu_preprocess_batch_s2d.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),                  # frames
        ctypes.POINTER(ctypes.c_int),                     # ihs
        ctypes.POINTER(ctypes.c_int),                     # iws
        ctypes.c_int, ctypes.c_int, ctypes.c_int,         # n, oh, ow
        ctypes.POINTER(ctypes.c_float),                   # mean
        ctypes.POINTER(ctypes.c_float),                   # std
        ctypes.c_int,                                     # to_rgb
        ctypes.c_void_p,                                  # out i8 (s2d)
        ctypes.c_float,                                   # act_scale
    ]
    lib.yolo_tpu_augment_one.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,      # src, h, w
        ctypes.c_int, ctypes.c_float,                     # bright
        ctypes.c_int, ctypes.c_int, ctypes.c_float,       # contrast
        ctypes.c_int, ctypes.c_float,                     # sat
        ctypes.c_int, ctypes.c_float,                     # hue
        ctypes.c_int, ctypes.c_int,                       # eh, ew
        ctypes.c_int, ctypes.c_int,                       # top, left
        ctypes.c_int, ctypes.c_int,                       # cx0, cy0
        ctypes.c_int, ctypes.c_int,                       # cx1, cy1
        ctypes.c_int, ctypes.c_int, ctypes.c_int,         # mirror, oh, ow
        ctypes.POINTER(ctypes.c_float),                   # mean
        ctypes.POINTER(ctypes.c_float),                   # std
        ctypes.c_int, ctypes.c_int,                       # to_rgb, u8_out
        ctypes.c_void_p, ctypes.c_void_p,                 # out f32 / u8
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def preprocess_batch(frames: List[np.ndarray], size: Tuple[int, int],
                     mean=BGR_MEAN, std=BGR_STD, rgb: bool = True,
                     int8_scale: Optional[float] = None,
                     layout: str = "nhwc"):
    """Fused resize+normalize(+quantize) of a list of u8 BGR frames.

    Returns float32 [N, h, w, 3] (rgb-ordered) or, with ``int8_scale``
    (the activation scale 2^sa_in), int8 [N, h, w, 3]. With
    ``layout='s2d'`` (requires int8_scale) the int8 output is the padded
    space-to-depth serving layout [N, h/2+3, w/2+3, 12] that feeds the
    fused MXU conv1+pool directly (fixed_point.s2d_input semantics).
    """
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    if layout not in ("nhwc", "s2d"):
        raise ValueError(f"unknown layout {layout!r}")
    if layout == "s2d" and int8_scale is None:
        raise ValueError("layout='s2d' requires int8_scale")
    n = len(frames)
    oh, ow = size
    frames = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    ptrs = (ctypes.c_void_p * n)(
        *[f.ctypes.data_as(ctypes.c_void_p).value for f in frames])
    ihs = (ctypes.c_int * n)(*[f.shape[0] for f in frames])
    iws = (ctypes.c_int * n)(*[f.shape[1] for f in frames])
    mean_c = (ctypes.c_float * 3)(*mean)
    std_c = (ctypes.c_float * 3)(*std)

    if layout == "s2d":
        out_i8 = np.zeros((n, (oh + 6) // 2, (ow + 6) // 2, 12), np.int8)
        lib.yolo_tpu_preprocess_batch_s2d(
            ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)), ihs, iws,
            n, oh, ow, mean_c, std_c, int(rgb),
            out_i8.ctypes.data_as(ctypes.c_void_p), float(int8_scale))
        return out_i8

    out_f32 = out_i8 = None
    of_p = oi_p = None
    if int8_scale is None:
        out_f32 = np.empty((n, oh, ow, 3), np.float32)
        of_p = out_f32.ctypes.data_as(ctypes.c_void_p)
    else:
        out_i8 = np.empty((n, oh, ow, 3), np.int8)
        oi_p = out_i8.ctypes.data_as(ctypes.c_void_p)

    lib.yolo_tpu_preprocess_batch(
        ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)), ihs, iws,
        n, oh, ow, mean_c, std_c, int(rgb), of_p, oi_p,
        float(int8_scale or 0.0))
    return out_f32 if int8_scale is None else out_i8


def augment_one(image_u8: np.ndarray, pp: dict, ep, rect, mirror: bool,
                size, mean, std, rgb: bool = True,
                u8_out: bool = False) -> np.ndarray:
    """Fused native SSD augmentation (native/augment.cpp
    yolo_tpu_augment_one): photometric -> expand -> crop -> mirror ->
    bilinear resize -> normalize (or uint8 round), one pass, no
    intermediate canvases. ``pp``/``ep``/``rect`` come from the
    data.transforms draw_* helpers (all randomness stays in numpy).
    Returns float32 normalized [oh, ow, 3] or uint8 with ``u8_out``."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    image_u8 = np.ascontiguousarray(image_u8, dtype=np.uint8)
    h, w = image_u8.shape[:2]
    eh, ew, top, left = (h, w, 0, 0) if ep is None else ep
    cx0, cy0, cx1, cy1 = (0, 0, ew, eh) if rect is None else \
        (int(rect[0]), int(rect[1]), int(rect[2]), int(rect[3]))
    oh, ow = size
    mean_c = (ctypes.c_float * 3)(*np.asarray(mean, np.float32))
    std_c = (ctypes.c_float * 3)(*np.asarray(std, np.float32))
    contrast = pp.get("contrast")
    if u8_out:
        out = np.empty((oh, ow, 3), np.uint8)
        of_p, ou_p = None, out.ctypes.data_as(ctypes.c_void_p)
    else:
        out = np.empty((oh, ow, 3), np.float32)
        of_p, ou_p = out.ctypes.data_as(ctypes.c_void_p), None
    lib.yolo_tpu_augment_one(
        image_u8.ctypes.data_as(ctypes.c_void_p), h, w,
        int(pp["bright"] is not None), float(pp["bright"] or 0.0),
        int(pp["contrast_first"]),
        int(contrast is not None), float(contrast or 0.0),
        int(pp["sat"] is not None), float(pp["sat"] or 0.0),
        int(pp["hue"] is not None), float(pp["hue"] or 0.0),
        eh, ew, top, left, cx0, cy0, cx1, cy1,
        int(mirror), oh, ow, mean_c, std_c, int(rgb), int(u8_out),
        of_p, ou_p)
    return out
