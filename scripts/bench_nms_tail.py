"""NMS-tail study at the headline configuration (slim INT8 s2d b256).

The b256 prefix attribution (round 4) put the in-graph postprocess at
~1.3 ms of the ~16.5 ms batch — the largest remaining non-conv cost.
Candidates, each timed as the FULL real serving graph (whole-graph
swap, never standalone ops — docs/PERFORMANCE.md methodology):

  exact   — lax.top_k pre-NMS candidate sort (the default)
  approx  — lax.approx_max_k partial reduction (TPU-native primitive)
  fast    — YOLACT-style one-shot suppression (no fixpoint loop)
  none    — decode only (lower bound; NOT a valid serving config)

Also reports detection agreement (boxes/classes/valid equality against
the exact graph) on random inputs so a faster tail can't silently
change what the detector returns.

Run on TPU:  python scripts/bench_nms_tail.py [--batch 256] [--size 416]
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


def timeit(f, *a, iters=30, warmup=5):
    for _ in range(warmup):
        jax.device_get(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--size", type=int, default=416)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    from yolo_tpu.config import get_config
    from yolo_tpu.ops import nms as nms_mod
    from yolo_tpu.quant import fixed_point as fp
    from yolo_tpu.quant.int8_graph import build_int8_detect, int8_predict

    cfg = get_config("slim_yolo_v2", "mask",
                     input_size=(args.size, args.size), pre_nms_top_k=128)
    _, m = build_int8_detect(cfg)

    b, s = args.batch, args.size
    rng = np.random.default_rng(0)
    images = rng.random((b, s, s, 3), dtype=np.float32)
    xq = np.clip(np.rint(images * 2.0 ** m.sa["in"]), -128, 127
                 ).astype(np.int8)
    x2 = jax.device_put(fp.s2d_input_np(xq))

    def graph(tail):
        def body(x):
            boxes, probs = int8_predict(m, x, cfg, "nearest", "xla",
                                        input_s2d=True)
            if tail == "none":
                return jnp.sum(boxes) + jnp.sum(probs)
            mode = "fast" if tail == "fast" else "greedy"
            tk = "approx" if tail == "approx" else "exact"
            return nms_mod.batched_postprocess(
                boxes, probs, cfg.conf_thresh, cfg.nms_thresh,
                cfg.pre_nms_top_k, cfg.top_k, mode, tk)
        return jax.jit(body)

    fns = {t: graph(t) for t in ("exact", "approx", "fast", "none")}

    # detection agreement vs exact, on the same random batch
    ref = [np.asarray(a) for a in fns["exact"](x2)]
    n_valid = int(ref[3].sum())
    print(f"batch {b} @{s}² — NMS tail variants (valid dets: {n_valid})")
    for t in ("approx", "fast"):
        got = [np.asarray(a) for a in fns[t](x2)]
        same = all(np.array_equal(r, g) for r, g in zip(ref, got))
        if same:
            print(f"  {t:7s}: detections IDENTICAL to exact")
        else:
            vd = int((ref[3] != got[3]).sum())
            bd = float(np.abs(ref[0] - got[0]).max())
            print(f"  {t:7s}: differs — valid mism {vd}, "
                  f"max box delta {bd:.4f}")

    for t in ("exact", "approx", "fast", "none"):
        dt = timeit(fns[t], x2, iters=args.iters)
        print(f"  {t:7s}: {dt*1e3:7.2f} ms/batch  ({b/dt:8.0f} img/s)",
              flush=True)


if __name__ == "__main__":
    main()
