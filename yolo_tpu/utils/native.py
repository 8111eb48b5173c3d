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


_ABI_VERSION = 2


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
