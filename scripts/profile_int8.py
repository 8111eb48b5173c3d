"""Prefix-graph attribution of the INT8 serving pipeline on the TPU.

The only reliable per-layer costing under the tunnel's multi-ms dispatch
jitter (docs/PERFORMANCE.md): jit the first k layers of the REAL fused
graph for k = 1..N and difference adjacent timings. All stage outputs
reduce to scalars so transfer time never pollutes the numbers.

Run on TPU:  python scripts/profile_int8.py [--batch 128] [--size 416]
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


def timeit(f, *a, iters=25, warmup=3):
    for _ in range(warmup):
        jax.device_get(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--size", type=int, default=416)
    args = p.parse_args()

    from yolo_tpu.config import get_config
    from yolo_tpu.models.slim_yolo_v2 import CONV_LAYERS
    from yolo_tpu.ops import nms as nms_mod
    from yolo_tpu.quant import fixed_point as fp
    from yolo_tpu.quant.int8_graph import build_int8_detect, int8_predict
    from yolo_tpu.quant.qsim import QUANT_LAYER_NAMES, TRACKER_NAMES

    cfg = get_config("slim_yolo_v2", "mask",
                     input_size=(args.size, args.size), pre_nms_top_k=128)
    _, m = build_int8_detect(cfg)

    b, s = args.batch, args.size
    rng = np.random.default_rng(0)
    images = jax.device_put(rng.random((b, s, s, 3), dtype=np.float32))
    xq = jax.device_put(
        rng.integers(-128, 127, (b, s, s, 3), dtype=np.int8))

    pools = {name: pool for name, _, _, pool in CONV_LAYERS}
    names = list(TRACKER_NAMES)

    def prefix_forward(x_q, k, rounding="nearest"):
        out = x_q
        for i, name in enumerate(QUANT_LAYER_NAMES[:k]):
            sa_in, sa_out = m.sa[names[i]], m.sa[names[i + 1]]
            r = m.retune[name]
            acc = jax.lax.conv_general_dilated(
                out.astype(jnp.int8), m.w_q[name], (1, 1),
                ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            acc = fp._shift(acc, m.sw[name] + sa_in - r, rounding, jnp)
            acc = acc + fp._shift(m.b_q[name], m.sb[name] - r, rounding,
                                  jnp)
            acc = jnp.clip(acc, fp.INT16_MIN, fp.INT16_MAX)
            if name != "pred":
                acc = fp._leaky_int(acc, rounding, jnp)
            out = jnp.clip(fp._shift(acc, r - sa_out, rounding, jnp),
                           -128, 127).astype(jnp.int8)
            if name != "pred" and pools.get(name):
                out = jax.lax.reduce_window(
                    out, jnp.int8(-128), jax.lax.max,
                    (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        return jnp.sum(out.astype(jnp.int32))

    print(f"batch {b} @{s}² — prefix-graph per-layer attribution")
    prev = 0.0
    for k in range(1, len(QUANT_LAYER_NAMES) + 1):
        f = jax.jit(lambda x, k=k: prefix_forward(x, k))
        t = timeit(f, xq)
        print(f"  prefix {k:2d} ({QUANT_LAYER_NAMES[k-1]:8s}):"
              f" {t*1e3:7.2f} ms   delta {(t-prev)*1e3:7.2f} ms",
              flush=True)
        prev = t

    # whole-pipeline stages, scalar-reduced
    def full(im):
        boxes, probs = int8_predict(m, im, cfg, "nearest", "xla")
        out = nms_mod.batched_postprocess(
            boxes, probs, cfg.conf_thresh, cfg.nms_thresh,
            cfg.pre_nms_top_k, cfg.top_k)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in out)

    def no_nms(im):
        boxes, probs = int8_predict(m, im, cfg, "nearest", "xla")
        return jnp.sum(boxes) + jnp.sum(probs)

    t_body = timeit(jax.jit(no_nms), images)
    t_full = timeit(jax.jit(full), images)
    print(f"  quantize+backbone+decode : {t_body*1e3:7.2f} ms"
          f"  ({b/t_body:8.0f} img/s)")
    print(f"  + NMS (full pipeline)    : {t_full*1e3:7.2f} ms"
          f"  ({b/t_full:8.0f} img/s)")


if __name__ == "__main__":
    main()
