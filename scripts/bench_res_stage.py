"""Residual-stage engine A/B: XLA fused graph vs the fused Pallas block
kernel (kernels.int8_conv.int8_res_block).

A darknet-53 stage is N repeats of [1x1 reduce -> 3x3 expand -> residual
add]. The XLA form folds the residual into the conv epilogue with an
optimization barrier (the round-3 fix, quant/int8_yolo_v3.py) and
measured ~148 TOPS at 52^2 C256 b64 — 92% of XLA's own int8 GEMM
ceiling (161). The Pallas block kernel chains whole blocks as single
kernels (y1 never leaves VMEM, residual in-register) using the 217-TOPS
matmul recipe; this script measures whether that wins inside a real
multi-block jit, per stage shape.

Run on TPU:  python scripts/bench_res_stage.py [--blocks 8] [--batch 64]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.quant import fixed_point as fp
from yolo_tpu.kernels import int8_conv as ker


def make_stage(rng, n_blocks, c, cmid):
    ws = []
    for _ in range(n_blocks):
        w1 = rng.integers(-30, 30, (1, 1, c, cmid)).astype(np.int8)
        b1 = rng.integers(-100, 100, (cmid,)).astype(np.int32)
        w2 = rng.integers(-30, 30, (3, 3, cmid, c)).astype(np.int8)
        b2 = rng.integers(-100, 100, (c,)).astype(np.int32)
        p1 = dict(sw=8, sb=7, sa_in=4, sa_out=3, retune=11)
        p2 = dict(sw=7, sb=8, sa_in=3, sa_out=4, retune=10)
        ws.append((w1, b1, p1, w2, b2, p2, 4))  # sa_res = sa_in: chainable
    return ws


def stage_xla(ws, x):
    for w1, b1, p1, w2, b2, p2, sa_res in ws:
        y1 = fp.int_conv_requant(x, jnp.asarray(w1), jnp.asarray(b1),
                                 padding=0, stride=1, **p1)
        x = fp.int_conv_requant(
            y1, jnp.asarray(w2), jnp.asarray(b2), padding=1, stride=1,
            residual=(jax.lax.optimization_barrier(x), p1["sa_in"]),
            sa_res=sa_res, **p2)
    return x


def stage_pallas(ws, x, row_tile=None, batch_tile=None):
    for w1, b1, p1, w2, b2, p2, sa_res in ws:
        x = ker.int8_res_block(
            x, jnp.asarray(w1), jnp.asarray(b1), p1, jnp.asarray(w2),
            jnp.asarray(b2), p2, sa_res=sa_res,
            row_tile=row_tile, batch_tile=batch_tile)
    return x


def timeit(f, x, iters=20):
    """Min over 3 timed batches after a device_get warmup. The warmup
    MUST be a device_get, not block_until_ready: until one full
    device->host read has happened, block_until_ready on a fresh
    executable's output returns early through the axon tunnel and
    multi-ms graphs read as microseconds."""
    out = jax.device_get(f(x))
    best = float("inf")
    for trial in range(4):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(x)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        if trial:
            best = min(best, dt)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=8)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--shapes", default="52:256,26:512,13:1024,104:128")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    for tok in args.shapes.split(","):
        hw, c = (int(v) for v in tok.split(":"))
        b = args.batch
        ws = make_stage(rng, args.blocks, c, c // 2)
        x = jax.device_put(
            rng.integers(-128, 128, (b, hw, hw, c)).astype(np.int8))
        flops = args.blocks * 2 * b * hw * hw * (c * c // 2 * 10)

        fx = jax.jit(functools.partial(stage_xla, ws))
        tx, ox = timeit(fx, x, args.iters)
        print(f"{hw:4d}^2 C{c:<5d} XLA   : {tx*1e3:8.3f} ms  "
              f"{flops/tx/1e12:6.1f} TOPS", flush=True)

        try:
            fpk = jax.jit(functools.partial(stage_pallas, ws))
            tp, op = timeit(fpk, x, args.iters)
            match = bool(np.array_equal(np.asarray(ox), np.asarray(op)))
            print(f"{hw:4d}^2 C{c:<5d} Pallas: {tp*1e3:8.3f} ms  "
                  f"{flops/tp/1e12:6.1f} TOPS  bit-exact={match}",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — probe records failures
            print(f"{hw:4d}^2 C{c:<5d} Pallas: FAILED "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
