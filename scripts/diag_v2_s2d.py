"""Diagnose the yolo_v2 s2d-entry regression (VERDICT r3 next #7).

Measured round 3: the fused s2d block-conv entry WINS at b64 (+24%) but
LOSES at b128+ (3,771 vs 4,502 img/s) — the only family where it does.
Hypothesis: darknet19's 32-channel conv_2 follows the entry directly and
XLA picks a worse layout chain for the block-conv output at b128+.

This script localizes and tests fixes:

1. prefix-graph deltas (profile_int8.py methodology) through the first
   four convs for the plain-int8 vs s2d entry forms at b128;
2. fix candidates, measured as whole graphs:
   - optimization_barrier pinning the entry output (stops layout
     propagation across the entry/conv_2 boundary);
   - both at b64 for the control (s2d should still win there);
3. dumps each variant's compiled HLO to /tmp/v2_hlo_<variant>.txt for
   layout inspection (grep the conv_2 fusion's operand layouts).

Run on TPU:  python scripts/diag_v2_s2d.py --batch 128
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

from yolo_tpu.config import get_config
from yolo_tpu.models import yolo_v2 as v2mod
from yolo_tpu.quant import fixed_point as fp
from yolo_tpu.quant.int8_models import (
    _V2_PAD, V2_CONV_ORDER, int8_yolo_v2_forward, quantize_pipeline_yolo_v2)


def timeit(f, x, iters=15):
    jax.device_get(jax.tree_util.tree_leaves(f(x))[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(x)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def build(batch, size=416):
    cfg = get_config("yolo_v2", "mask", input_size=(size, size),
                     pre_nms_top_k=128)
    params = v2mod.init_params(jax.random.PRNGKey(0), cfg,
                               batch_norm=True)
    rng = np.random.default_rng(0)
    calib = [rng.random((4, size, size, 3), dtype=np.float32)
             for _ in range(2)]
    m = quantize_pipeline_yolo_v2(params, cfg, calib)
    images = rng.random((batch, size, size, 3), dtype=np.float32)
    x_q = np.clip(np.rint(images * 2.0 ** m.sa["in"]), -128, 127
                  ).astype(np.int8)
    x_s2d = fp.s2d_input_np(x_q)
    return cfg, m, jax.device_put(x_q), jax.device_put(x_s2d)


def prefix_fn(m, upto: int, input_s2d: bool, barrier: bool):
    """First ``upto`` convs of the integer v2 graph -> scalar."""

    def conv(name, x, sa_in):
        return fp.int_conv_requant(
            x, m.w_q[name], m.b_q[name], sw=m.sw[name], sb=m.sb[name],
            sa_in=sa_in, sa_out=m.sa[name], retune=m.retune[name],
            padding=_V2_PAD[name], leaky=True)

    seq = [("conv_1.0", True), ("conv_2.0", True), ("conv_3.0", False),
           ("conv_3.1", False), ("conv_3.2", True)]

    @jax.jit
    def f(x):
        if input_s2d:
            out = fp.int8_conv_pool_s2d_core(
                x, m.w_q["conv_1.0"], m.b_q["conv_1.0"], c_in=3,
                sw=m.sw["conv_1.0"], sb=m.sb["conv_1.0"],
                sa_in=m.sa["in"], sa_out=m.sa["conv_1.0"],
                retune=m.retune["conv_1.0"])
            if barrier:
                out = jax.lax.optimization_barrier(out)
            prev = "conv_1.0"
            start = 1
        else:
            out, prev, start = x, "in", 0
        for name, pool in seq[start:upto]:
            if name == "conv_1.0":
                out = conv(name, out, m.sa[prev])
                out = fp.int_maxpool(out)
            else:
                out = conv(name, out, m.sa[prev])
                if pool:
                    out = fp.int_maxpool(out)
            prev = name
        return jnp.sum(out.astype(jnp.int32))

    return f


def full_fn(m, input_s2d: bool, barrier: bool, conv2_s2d: bool = False):
    @jax.jit
    def f(x):
        if barrier or conv2_s2d:
            # same graph as int8_yolo_v2_forward with the variant tweak
            head = _forward_barrier(m, x, barrier=barrier,
                                    conv2_s2d=conv2_s2d)
        else:
            head = int8_yolo_v2_forward(m, x, input_s2d=input_s2d)
        return jnp.sum(head[0])

    return f


def _forward_barrier(m, x_q, barrier: bool = True,
                     conv2_s2d: bool = False):
    out = fp.int8_conv_pool_s2d_core(
        x_q, m.w_q["conv_1.0"], m.b_q["conv_1.0"], c_in=3,
        sw=m.sw["conv_1.0"], sb=m.sb["conv_1.0"], sa_in=m.sa["in"],
        sa_out=m.sa["conv_1.0"], retune=m.retune["conv_1.0"])
    if barrier:
        out = jax.lax.optimization_barrier(out)
    # continue with the stock graph from conv_2 on: rebuild by calling
    # the library forward on a wrapper is not possible mid-graph, so
    # inline the remainder (same ops as int8_yolo_v2_forward).
    from yolo_tpu.ops import blocks

    def conv(name, x, sa_in, leaky=True):
        return fp.int_conv_requant(
            x, m.w_q[name], m.b_q[name], sw=m.sw[name], sb=m.sb[name],
            sa_in=sa_in, sa_out=m.sa[name], retune=m.retune[name],
            padding=_V2_PAD[name], leaky=leaky)

    def run(seq, n, x, prev):
        for j in range(n):
            name = f"{seq}.{j}"
            x = conv(name, x, m.sa[prev])
            prev = name
        return x, prev

    prev = "conv_1.0"
    if conv2_s2d:
        # conv_2 + its pool in the fused s2d form: the block relayout of
        # the consumer sidesteps whatever layout chain XLA picked for
        # the entry output
        out = fp.int8_conv_pool_s2d(
            out, m.w_q["conv_2.0"], m.b_q["conv_2.0"],
            sw=m.sw["conv_2.0"], sb=m.sb["conv_2.0"], sa_in=m.sa[prev],
            sa_out=m.sa["conv_2.0"], retune=m.retune["conv_2.0"])
        prev = "conv_2.0"
    else:
        out, prev = run("conv_2", 1, out, prev)
        out = fp.int_maxpool(out)
    out, prev = run("conv_3", 3, out, prev)
    out = fp.int_maxpool(out)
    c4, prev4 = run("conv_4", 3, out, prev)
    c5, prev5 = run("conv_5", 5, fp.int_maxpool(c4), prev4)
    c6, prev6 = run("conv_6", 5, fp.int_maxpool(c5), prev5)
    f2 = conv("convsets_1.0", c6, m.sa[prev6])
    f2 = conv("convsets_1.1", f2, m.sa["convsets_1.0"])
    route = conv("route_layer", c5, m.sa[prev5])
    f1 = blocks.reorg(route, 2)
    head = conv("convsets_2.0",
                [(f1, m.sa["route_layer"]), (f2, m.sa["convsets_1.1"])],
                sa_in=None)
    pred = conv("pred", head, m.sa["convsets_2.0"], leaky=False)
    return [pred.astype(jnp.float32) * 2.0 ** -m.sa["pred"]]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--prefixes", action="store_true", default=False)
    p.add_argument("--hlo", action="store_true", default=False)
    a = p.parse_args()

    cfg, m, x_q, x_s2d = build(a.batch)
    b = a.batch

    variants = [("plain-i8", full_fn(m, False, False), x_q),
                ("s2d", full_fn(m, True, False), x_s2d),
                ("s2d+barrier", full_fn(m, True, True), x_s2d),
                ("s2d+conv2s2d", full_fn(m, True, False, True), x_s2d),
                ("s2d+bar+c2s2d", full_fn(m, True, True, True), x_s2d)]
    print(f"== full backbone graphs, b{b} @416² ==")
    for name, f, x in variants:
        t = timeit(f, x)
        print(f"  {name:12s}: {t*1e3:7.2f} ms/batch  {b/t:7.0f} img/s",
              flush=True)
        if a.hlo:
            txt = f.lower(x).compile().as_text()
            path = f"/tmp/v2_hlo_{name.replace('+','_')}.txt"
            with open(path, "w") as fh:
                fh.write(txt)
            print(f"    HLO -> {path}")

    if a.prefixes:
        print(f"\n== prefix deltas (first k convs), b{b} ==")
        for mode, x, barrier in (("plain-i8", x_q, False),
                                 ("s2d", x_s2d, False),
                                 ("s2d+barrier", x_s2d, True)):
            ts = []
            for k in range(1, 6):
                f = prefix_fn(m, k, mode != "plain-i8", barrier)
                ts.append(timeit(f, x, iters=10))
            row = "  ".join(f"{t*1e3:6.2f}" for t in ts)
            deltas = "  ".join(
                f"{(ts[i] - ts[i - 1])*1e3:+6.2f}" for i in range(1, 5))
            print(f"  {mode:12s}: cum [{row}] ms; deltas [{deltas}]",
                  flush=True)


if __name__ == "__main__":
    main()
