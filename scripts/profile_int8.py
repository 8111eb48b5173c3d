"""Stage- and layer-level timing of the INT8 serving graph on the TPU.

Identifies where the batch-128 @416² pipeline spends its time:
input quantize -> int8 backbone -> decode -> NMS, plus per-layer conv
cost, so perf work targets the real bottleneck (VERDICT r1 weak #2).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        jax.device_get(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--size", type=int, default=416)
    p.add_argument("--backend", default="xla")
    args = p.parse_args()

    from yolo_tpu.config import get_config
    from yolo_tpu.quant import fixed_point as fp
    from yolo_tpu.quant.int8_graph import (
        build_int8_detect, int8_predict, make_int8_detect_fn)

    cfg = get_config("slim_yolo_v2", "mask",
                     input_size=(args.size, args.size), pre_nms_top_k=256)
    fn, m = build_int8_detect(cfg, backend=args.backend)

    b, s = args.batch, args.size
    images = jax.device_put(np.random.default_rng(0).random(
        (b, s, s, 3), dtype=np.float32))

    # stage timings
    q = jax.jit(lambda im: fp.quantize_input(im, m.sa["in"]))
    x_q = jax.device_get(q(images))
    x_q_dev = jax.device_put(x_q)

    fwd = jax.jit(lambda xq: fp.int8_forward(m, xq, "nearest"))
    pred = jax.jit(lambda im: int8_predict(m, im, cfg, "nearest",
                                           args.backend))
    full = make_int8_detect_fn(m, cfg, "nearest", args.backend)

    t_q = timeit(q, images)
    t_fwd = timeit(fwd, x_q_dev)
    t_pred = timeit(pred, images)
    t_full = timeit(full, images)

    print(f"batch {b} @{s}²  ({args.backend})")
    print(f"  quantize_input        : {t_q*1e3:8.2f} ms"
          f"  ({b/t_q:9.0f} img/s)")
    print(f"  int8 backbone         : {t_fwd*1e3:8.2f} ms"
          f"  ({b/t_fwd:9.0f} img/s)")
    print(f"  + decode (pred)       : {t_pred*1e3:8.2f} ms"
          f"  ({b/t_pred:9.0f} img/s)")
    print(f"  + NMS (full)          : {t_full*1e3:8.2f} ms"
          f"  ({b/t_full:9.0f} img/s)")

    # per-layer conv timings on the real int8 graph shapes
    from yolo_tpu.quant.fixed_point import CONV_LAYERS
    print("  per-layer int8 conv (XLA):")
    x = x_q_dev
    for name, c_in, c_out, pool in CONV_LAYERS:
        wq = m.w_q[name]

        def one(xq, wq=wq):
            acc = jax.lax.conv_general_dilated(
                xq.astype(jnp.int32), wq.astype(jnp.int32),
                window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return jnp.clip(acc >> 7, -128, 127).astype(jnp.int8)

        j = jax.jit(one)
        t = timeit(j, x, iters=10)
        macs = b * x.shape[1] * x.shape[2] * c_in * c_out * 9
        tops = 2 * macs / t / 1e12
        print(f"    {name:8s} {x.shape[1]:4d}x{x.shape[2]:<4d}"
              f" {c_in:3d}->{c_out:3d} : {t*1e3:7.2f} ms  {tops:6.1f} TOPS")
        x = jax.device_put(np.asarray(jax.device_get(j(x))))
        if pool:
            x = jax.device_put(np.asarray(jax.device_get(jax.jit(
                lambda v: jax.lax.reduce_window(
                    v, jnp.int8(-128), jax.lax.max,
                    (1, 2, 2, 1), (1, 2, 2, 1), "VALID"))(x))))


if __name__ == "__main__":
    main()
