"""Per-model INT8 serving throughput on one chip.

All five families run their TRUE-INTEGER engines end-to-end (quantize ->
int8 convs -> decode -> in-graph NMS) with random weights + synthetic
calibration (structure-real perf, accuracy-irrelevant).

Run on TPU:  python scripts/bench_models.py [--size 416] [--batch 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import numpy as np

from yolo_tpu.config import get_config
from yolo_tpu.detector import Detector


def timeit(f, *a, iters=20, warmup=3):
    for _ in range(warmup):
        jax.device_get(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters


def build(version, cfg, params, calib, input_mode="f32"):
    """(int8_model, detect_fn) via the family dispatch; input_mode
    f32 | int8 (host-quantized) | s2d (padded space-to-depth layout)."""
    from yolo_tpu.quant.dispatch import build_int8_detector
    return build_int8_detector(version, params, cfg, calib,
                               input_s2d=(input_mode == "s2d"))


# per-image GFLOPs of the conv stack at 416² (XLA cost analysis via
# cli/info.py); used for the MFU column (int8 peak ~394 TOPS on v5e)
_GFLOPS_416 = {"slim_yolo_v2": 4.93, "yolo_v2": 29.4, "tiny_yolo_v3": 5.5,
               "yolo_v3": 65.6, "yolo_v3_spp": 66.2}
_INT8_PEAK_TOPS = 394.0


def measure(version, size, batch, rng, iters=20, input_mode="f32"):
    """``size``: int (square) or (H, W) — e.g. (240, 320), the
    reference's camera deployment shape (c_embedding/main.c:44)."""
    from yolo_tpu.quant import fixed_point as fp
    from yolo_tpu.quant.dispatch import input_scale_exponent

    h, w = (size, size) if isinstance(size, int) else size
    cfg = get_config(version, "mask", input_size=(h, w),
                     pre_nms_top_k=128)
    det = Detector(cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    calib = [rng.random((4, h, w, 3), dtype=np.float32)]
    m, detect = build(version, cfg, params, calib, input_mode)
    images = rng.random((batch, h, w, 3), dtype=np.float32)
    if input_mode in ("int8", "s2d"):
        sa = input_scale_exponent(m)
        images = np.clip(np.rint(images * 2.0 ** sa), -128, 127
                         ).astype(np.int8)
        if input_mode == "s2d":
            images = fp.s2d_input_np(images)
    images = jax.device_put(images)
    t = timeit(detect, images, iters=iters)
    gf = _GFLOPS_416.get(version, 0.0) * (h * w) / 416 ** 2
    mfu = (batch / t) * gf / 1e3 / _INT8_PEAK_TOPS
    shape = f"@{h}²" if h == w else f"@{h}x{w}"
    print(f"{version:14s} INT8/{input_mode:4s} {shape} b{batch:3d}: "
          f"{t*1e3:7.2f} ms  {batch/t:8.0f} img/s   MFU {mfu*100:4.1f}%",
          flush=True)
    return batch / t


def main(size=416, batches=(64,), versions=None, input_mode="f32"):
    rng = np.random.default_rng(0)
    versions = versions or ("slim_yolo_v2", "yolo_v2", "tiny_yolo_v3",
                            "yolo_v3", "yolo_v3_spp")
    for version in versions:
        for batch in batches:
            measure(version, size, batch, rng, input_mode=input_mode)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, nargs="+", default=[416],
                   help="square size, or H W (e.g. --size 240 320, the "
                   "reference camera deployment shape)")
    p.add_argument("--batch", type=int, nargs="+", default=[64])
    p.add_argument("--versions", nargs="+", default=None)
    p.add_argument("--input", default="f32",
                   choices=["f32", "int8", "s2d"])
    a = p.parse_args()
    size = a.size[0] if len(a.size) == 1 else tuple(a.size[:2])
    main(size, tuple(a.batch), a.versions, a.input)
