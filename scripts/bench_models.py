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


def build(version, cfg, params, calib):
    if version == "slim_yolo_v2":
        from yolo_tpu.quant.int8_graph import (
            make_int8_detect_fn, quantize_pipeline)
        return make_int8_detect_fn(quantize_pipeline(params, cfg, calib),
                                   cfg)
    if version == "yolo_v2":
        from yolo_tpu.quant.int8_models import (
            make_int8_yolo_v2_detect_fn, quantize_pipeline_yolo_v2)
        return make_int8_yolo_v2_detect_fn(
            quantize_pipeline_yolo_v2(params, cfg, calib), cfg)
    if version == "tiny_yolo_v3":
        from yolo_tpu.quant.int8_models import (
            make_int8_tiny_detect_fn, quantize_pipeline_tiny)
        return make_int8_tiny_detect_fn(
            quantize_pipeline_tiny(params, cfg, calib), cfg)
    from yolo_tpu.quant.int8_yolo_v3 import (
        make_int8_yolo_v3_detect_fn, quantize_pipeline_yolo_v3)
    return make_int8_yolo_v3_detect_fn(
        quantize_pipeline_yolo_v3(params, cfg, calib,
                                  spp=version.endswith("_spp")), cfg)


# per-image GFLOPs of the conv stack at 416² (XLA cost analysis via
# cli/info.py); used for the MFU column (int8 peak ~394 TOPS on v5e)
_GFLOPS_416 = {"slim_yolo_v2": 4.93, "yolo_v2": 29.4, "tiny_yolo_v3": 5.5,
               "yolo_v3": 65.6, "yolo_v3_spp": 66.2}
_INT8_PEAK_TOPS = 394.0


def measure(version, size, batch, rng, iters=20):
    cfg = get_config(version, "mask", input_size=(size, size),
                     pre_nms_top_k=128)
    det = Detector(cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    calib = [rng.random((4, size, size, 3), dtype=np.float32)]
    detect = build(version, cfg, params, calib)
    images = jax.device_put(rng.random((batch, size, size, 3),
                                       dtype=np.float32))
    t = timeit(detect, images, iters=iters)
    gf = _GFLOPS_416.get(version, 0.0) * (size / 416) ** 2
    mfu = (batch / t) * gf / 1e3 / _INT8_PEAK_TOPS
    print(f"{version:14s} INT8 @{size}² b{batch:3d}: {t*1e3:7.2f} ms  "
          f"{batch/t:8.0f} img/s   MFU {mfu*100:4.1f}%", flush=True)
    return batch / t


def main(size=416, batches=(64,), versions=None):
    rng = np.random.default_rng(0)
    versions = versions or ("slim_yolo_v2", "yolo_v2", "tiny_yolo_v3",
                            "yolo_v3", "yolo_v3_spp")
    for version in versions:
        for batch in batches:
            measure(version, size, batch, rng)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=416)
    p.add_argument("--batch", type=int, nargs="+", default=[64])
    p.add_argument("--versions", nargs="+", default=None)
    a = p.parse_args()
    main(a.size, tuple(a.batch), a.versions)
