"""What int8 throughput can this chip actually reach? (ceiling probes)

The v5e spec sheet says ~394 TOPS int8. This script measures what the
compilation stack actually delivers on big, clean matmuls:

- XLA ``dot_general(s8, s8, preferred=s32)`` at 8192^3
- a tuned Pallas/Mosaic tiled matmul (s32 VMEM accumulator, K-innermost
  grid, ``dimension_semantics=('parallel','parallel','arbitrary')``)

Round-3 measurements (one v5e, quiet machine, 20-30 iters, stable):
XLA ~161 TOPS; Pallas ~217 TOPS at (bm, bn, bk) = (512, 1024, 2048) —
i.e. neither path reaches the native 2x-int8 rate, and Mosaic beats
XLA's int8 GEMM by ~35%. Use THESE numbers (not 394) when judging conv
MFU: yolo_v3's serving graph at ~153 TOPS effective is ~95% of the XLA
ceiling it compiles through.

CAUTION: per-conv standalone comparisons (also printed below) swing 2-5x
run to run under tunnel contention — only the long matmul probes are
stable. Layer-level engine decisions must use prefix-graph deltas inside
the real fused graph (scripts/profile_int8.py methodology).

Run on TPU:  python scripts/bench_int8_ceiling.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(f, *a, iters=30):
    jax.device_get(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters


def xla_gemm(M, K, N, rng, label, eff: float = 1.0):
    a = jax.device_put(rng.integers(-127, 128, (M, K)).astype(np.int8))
    b = jax.device_put(rng.integers(-127, 128, (K, N)).astype(np.int8))
    f = jax.jit(lambda x, y: jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).sum())
    t = timeit(f, a, b)
    extra = ("" if eff == 1.0 else
             f"  eff {eff*2*M*K*N/t/1e12:6.1f} TOPS")
    print(f"XLA    {label:24s}: {t*1e3:7.3f} ms  "
          f"{2*M*K*N/t/1e12:6.1f} TOPS{extra}", flush=True)


def pallas_gemm(M, K, N, rng, bm=512, bn=1024, bk=2048,
                eff: float = 1.0):
    k_steps = K // bk

    def kernel(a_ref, b_ref, o_ref, acc_ref):
        @pl.when(pl.program_id(2) == 0)
        def _zero():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

        @pl.when(pl.program_id(2) == k_steps - 1)
        def _out():
            o_ref[...] = acc_ref[...]

    mm = pl.pallas_call(
        kernel,
        grid=(M // bm, N // bn, k_steps),
        in_specs=[pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                  pl.BlockSpec((bk, bn), lambda i, j, k: (k, j))],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + K * N + M * N * 4,
            transcendentals=0),
    )
    a = jax.device_put(rng.integers(-127, 128, (M, K)).astype(np.int8))
    b = jax.device_put(rng.integers(-127, 128, (K, N)).astype(np.int8))
    f = jax.jit(lambda a, b: mm(a, b).sum())
    t = timeit(f, a, b, iters=20)
    extra = ("" if eff == 1.0 else
             f"  eff {eff*2*M*N*K/t/1e12:6.1f} TOPS")
    print(f"Pallas int8 bm={bm} bn={bn} bk={bk}: {t*1e3:7.3f} ms  "
          f"{2*M*N*K/t/1e12:6.1f} TOPS{extra}", flush=True)


def smallc():
    """GEMM upper bounds for the VERDICT r3 #3 question: can an
    im2col-widened Mosaic kernel beat XLA's conv on the darknet53
    small-C stages (208²C64 / 104²C128, ~85 TOPS whole-stage)?

    Probes the PURE GEMM at the exact widened shapes — no im2col
    assembly cost, so each row is a hard ceiling for any kernel built
    on that decomposition:

    - plain im2col (contraction 9·C_in): the untried kernel form.
    - s2d-OUTPUT im2col (contraction 16·C_in, N = 4·C_out): widens the
      collapsed N dim 4x at 16/9 extra FLOPs (each output phase uses 9
      of the 16 patch taps; 'eff TOPS' scales measured TOPS by 9/16).

    If eff TOPS < the stage's 85-TOPS XLA conv, the kernel cannot win
    and the study closes by measurement.
    """
    rng = np.random.default_rng(0)
    # (label, M, K, N, useful_frac, bm)
    probes = [
        ("stage1 3x3 im2col9 (208², 32->64, b64)",
         2768896, 288, 64, 1.0),
        ("stage2 3x3 im2col9 (104², 64->128, b64)",
         692224, 576, 128, 1.0),
        ("stage1 3x3 s2d-out im2col16 (->104²x256, b64)",
         692224, 512, 256, 9 / 16),
        ("stage2 3x3 s2d-out im2col16 (->52²x512, b64)",
         173056, 1024, 512, 9 / 16),
    ]
    for label, M, K, N, frac in probes:
        print(f"-- {label}: useful MACs x{frac:.3f}")
        xla_gemm(M, K, N, rng, f"  XLA dot {M}x{K}x{N}", eff=frac)
        for bm in (512, 1024):
            try:
                pallas_gemm(M, K, N, rng, bm=bm, bn=N, bk=K, eff=frac)
            except Exception as e:
                print(f"  Pallas bm={bm}: FAILED {type(e).__name__}: "
                      f"{str(e)[:140]}", flush=True)


def main():
    import sys

    rng = np.random.default_rng(0)
    if "--smallc" in sys.argv:
        smallc()
        return
    M = K = N = 8192
    xla_gemm(M, K, N, rng, "8192^3 int8")
    for bm, bn, bk in ((512, 1024, 2048), (1024, 1024, 512)):
        pallas_gemm(M, K, N, rng, bm, bn, bk)
    # conv-GEMM shapes (UNSTABLE standalone; directional only)
    xla_gemm(173056, 2304, 256, rng, "conv4-shaped GEMM")
    xla_gemm(692224, 1152, 128, rng, "conv3-shaped GEMM")


if __name__ == "__main__":
    main()
