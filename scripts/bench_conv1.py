"""Benchmark the conv1/conv2 (small-C_in, VPU-bound) alternatives inside
the REAL fused int8 backbone (VERDICT r2 weak #2 / next #1).

Whole-graph comparison — the only honest method under the tunnel's
dispatch jitter (docs/PERFORMANCE.md methodology): each variant jits
quantized-input -> full 10-layer int8 backbone -> jnp.sum, so the
difference between variants is exactly the layer implementation swap.

Variants:
  xla            current default (XLA conv; conv1/conv2 go to the VPU)
  s2d1 / s2d12   fused space-to-depth conv+pool (MXU) on conv1 (+conv2)
  pal1-s2  / pal1-s2d   Pallas pooled-window kernel on conv1
                         (stride2 / s2d col assembly)

All variants are bit-exact with each other (asserted before timing).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.config import get_config
from yolo_tpu.kernels.int8_conv import int8_conv3x3_pool_requant
from yolo_tpu.quant import fixed_point as fp
from yolo_tpu.quant.int8_graph import quantize_pipeline


def build_model(size: int):
    from yolo_tpu.models import slim_yolo_v2

    cfg = get_config("slim_yolo_v2", "mask", input_size=(size, size))
    params = slim_yolo_v2.init_params(jax.random.PRNGKey(0), cfg,
                                      batch_norm=True)
    rng = np.random.default_rng(0)
    calib = [rng.random((8, size, size, 3), dtype=np.float32)
             for _ in range(2)]
    return quantize_pipeline(params, cfg, calib)


def variants(m):
    pal = lambda asm: {"conv1": partial(int8_conv3x3_pool_requant,
                                        assembly=asm)}
    return {
        "xla": lambda x: fp.int8_forward(m, x),
        "s2d1": lambda x: fp.int8_forward(m, x, s2d_layers=("conv1",)),
        "s2d12": lambda x: fp.int8_forward(
            m, x, s2d_layers=("conv1", "conv2")),
        "pal1-s2": lambda x: fp.int8_forward(m, x,
                                             layer_impls=pal("stride2")),
        "pal1-s2d": lambda x: fp.int8_forward(m, x,
                                              layer_impls=pal("s2d")),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--skip", default="",
                    help="comma-separated variants to skip")
    args = ap.parse_args()

    m = build_model(args.size)
    rng = np.random.default_rng(1)
    x_q = jax.device_put(rng.integers(
        -128, 128, (args.batch, args.size, args.size, 3)).astype(np.int8))

    skip = set(filter(None, args.skip.split(",")))
    results = {}
    ref = None
    for name, fwd in variants(m).items():
        if name in skip:
            continue
        fn = jax.jit(lambda x, fwd=fwd: jnp.sum(fwd(x)))
        t_c0 = time.perf_counter()
        out = jax.device_get(fn(x_q))  # compile+run
        compile_s = time.perf_counter() - t_c0
        if ref is None:
            ref = out
        else:
            assert out == ref, f"{name} diverges from xla: {out} vs {ref}"
        # timed loop, sync via final device_get of the scalar
        jax.device_get(fn(x_q))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            o = fn(x_q)
        jax.device_get(o)
        dt = (time.perf_counter() - t0) / args.iters
        results[name] = dt * 1e3
        print(f"{name:10s} {dt * 1e3:8.2f} ms/batch "
              f"({args.batch / dt:8.0f} img/s)  [compile {compile_s:.0f}s]",
              flush=True)
    print(json.dumps({"batch": args.batch, "size": args.size,
                      "ms": results}))


if __name__ == "__main__":
    main()
