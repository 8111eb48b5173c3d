"""Prefix-graph attribution of the INT8 yolo_v3 serving pipeline.

Same methodology as scripts/profile_int8.py (the only honest costing
under the tunnel's dispatch jitter): jit the first k ops of the REAL
integer program at stage boundaries, difference adjacent timings. Every
prefix reduces its live tensors to one scalar so transfer time never
pollutes the numbers.

Run on TPU:  python scripts/profile_v3.py [--batch 64] [--size 416]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *a, iters=15, warmup=3):
    for _ in range(warmup):
        jax.device_get(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters


def stage_cuts(program):
    """(label, op_count) prefix cut points: after each backbone stage
    and each FPN/head section."""
    cuts = []
    last_name = None
    for i, op in enumerate(program):
        if op[0] == "conv" and op[1][0] == "backbone":
            name = op[1][1]
            if name != last_name and last_name is not None:
                cuts.append((f"backbone/{last_name}", i))
            last_name = name
        elif op[0] == "save" and last_name is not None:
            continue
    # end of backbone = first non-backbone conv/spp op
    for i, op in enumerate(program):
        if op[0] == "spp" or (op[0] == "conv"
                              and op[1][0] == "conv_set_3"):
            cuts.append((f"backbone/{last_name}", i))
            break
    for marker, label in ((("save", "fmp3"), "conv_set_3"),
                          (("save", "fmp2"), "up+concat+conv_set_2"),
                          (("save", "fmp1"), "up+concat+conv_set_1")):
        cuts.append((label, program.index(marker) + 1))
    cuts.append(("extra+pred heads", len(program)))
    return cuts


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--size", type=int, default=416)
    p.add_argument("--spp", action="store_true")
    p.add_argument("--s2d", default="entry")
    args = p.parse_args()

    from yolo_tpu.config import get_config
    from yolo_tpu.detector import Detector
    from yolo_tpu.ops import nms as nms_mod
    from yolo_tpu.quant import fixed_point as fp
    from yolo_tpu.quant.int8_yolo_v3 import (
        int8_yolo_v3_forward, make_int8_yolo_v3_detect_fn,
        quantize_pipeline_yolo_v3)

    version = "yolo_v3_spp" if args.spp else "yolo_v3"
    s = args.size
    cfg = get_config(version, "mask", input_size=(s, s),
                     pre_nms_top_k=128)
    det = Detector(cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    calib = [rng.random((4, s, s, 3), dtype=np.float32)]
    m = quantize_pipeline_yolo_v3(params, cfg, calib, spp=args.spp)
    s2d = {"False": False, "True": True}.get(args.s2d, args.s2d)

    b = args.batch
    xq = jax.device_put(
        rng.integers(-128, 127, (b, s, s, 3), dtype=np.int8))

    @partial(jax.jit, static_argnums=1)
    def prefix(x_q, k):
        live = int8_yolo_v3_forward(m, x_q, s2d=s2d, limit=k)
        return sum(jnp.sum(t.astype(jnp.int32)) for t in live)

    cuts = stage_cuts(m.program)
    print(f"{version} @{s}² b{b} s2d={s2d}  (prefix deltas, ms/batch)")
    prev_t, prev_label = 0.0, None
    rows = []
    for label, k in cuts:
        t = timeit(prefix, xq, k)
        rows.append((label, t - prev_t, t))
        print(f"  {label:28s} {1e3 * (t - prev_t):7.2f}  "
              f"(cum {1e3 * t:7.2f})", flush=True)
        prev_t = t

    # full detect incl. decode+NMS for the tail cost
    detect = make_int8_yolo_v3_detect_fn(m, cfg, s2d=s2d)
    t_full = timeit(detect, xq.astype(jnp.float32) / 64.0)
    print(f"  {'decode+NMS tail':28s} {1e3 * (t_full - prev_t):7.2f}  "
          f"(full {1e3 * t_full:7.2f}, {b / t_full:7.0f} img/s)")


if __name__ == "__main__":
    main()
