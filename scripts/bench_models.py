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


def main(size=416, batch=64):
    rng = np.random.default_rng(0)
    for version in ("slim_yolo_v2", "yolo_v2", "tiny_yolo_v3", "yolo_v3",
                    "yolo_v3_spp"):
        cfg = get_config(version, "mask", input_size=(size, size),
                         pre_nms_top_k=128)
        det = Detector(cfg)
        params = det.init_params(jax.random.PRNGKey(0))
        calib = [rng.random((4, size, size, 3), dtype=np.float32)]
        detect = build(version, cfg, params, calib)
        images = jax.device_put(rng.random((batch, size, size, 3),
                                           dtype=np.float32))
        t = timeit(detect, images)
        print(f"{version:14s} INT8 @{size}² b{batch}: {t*1e3:7.2f} ms  "
              f"{batch/t:8.0f} img/s", flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=416)
    p.add_argument("--batch", type=int, default=64)
    a = p.parse_args()
    main(a.size, a.batch)
