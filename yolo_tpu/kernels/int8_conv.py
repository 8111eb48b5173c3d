"""Pallas TPU kernel: fused int8 3x3 conv + fixed-point requantization.

This is the MXU-native replacement for the reference's FPGA conv
accelerator datapath (c_embedding/yolo_forward.c:575-770): one kernel
computes conv3x3 (stride 1, pad 1) as nine shifted int8 matmuls with
int32 accumulation in VMEM, then applies the hardware requantization
chain in-register — accumulator shift to the retune scale, bias add,
int16 saturation, LeakyReLU-as-arithmetic-shift, output shift, int8
saturation — and writes int8. Activations live in HBM as int8 only;
the int32 accumulator never leaves VMEM. (The XLA int8 conv path keeps
int32 feature maps in HBM between ops, paying 4x the bandwidth.)

The per-layer shift amounts are trace-time constants (the scale_w/
scale_a/retune exponent tables, c_embedding/yolo_forward.c:32-35), so
each layer compiles to a specialized kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT16_MIN, INT16_MAX = -(2 ** 15), 2 ** 15 - 1
INT8_MIN, INT8_MAX = -128, 127


def _shift_round_nearest(v, s: int):
    """Integer multiply by 2^-s, round-half-away (s >= 0 static)."""
    if s == 0:
        return v
    if s < 0:
        return v * (1 << -s)
    offset = 1 << (s - 1)
    mag = jax.lax.shift_right_logical(jnp.abs(v) + offset, s)
    return jnp.sign(v) * mag.astype(v.dtype)


def _shift_floor(v, s: int):
    if s == 0:
        return v
    if s < 0:
        return v * (1 << -s)
    return jax.lax.shift_right_arithmetic(v, s)


def _conv_kernel(x_hbm, w_ref, b_ref, out_ref, xs, sem, *,
                 th: int, w_out: int, c_in: int, c_out: int,
                 acc_shift: int, out_shift: int, leaky: bool,
                 rounding: str):
    """One grid step: rows [i*th, i*th+th) of one image.

    x_hbm: [B, H+2, W+2, C_in] int8 (pre-padded).
    w_ref: [9, C_in, C_out] int8 in VMEM (tap-major).
    b_ref: [1, C_out] int32 — bias already shifted to the retune scale.
    out_ref: [1, th, W, C_out] int8 block.
    xs: VMEM scratch [th+2, W+2, C_in] int8.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    shift = (_shift_round_nearest if rounding == "nearest"
             else _shift_floor)

    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * th, th + 2)], xs, sem)
    cp.start()
    cp.wait()

    bias = b_ref[0, :]  # [C_out] int32 at retune scale

    def row_body(r, _):
        acc = jnp.zeros((w_out, c_out), jnp.int32)
        for dy in range(3):
            for dx in range(3):
                lhs = xs[r + dy, pl.ds(dx, w_out), :]  # [W, C_in] int8
                acc = acc + jax.lax.dot_general(
                    lhs, w_ref[dy * 3 + dx],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
        # requant chain (c_embedding/yolo_forward.c:233-257 semantics)
        acc = shift(acc, acc_shift) + bias[None, :]
        acc = jnp.clip(acc, INT16_MIN, INT16_MAX)  # int16 accumulator
        if leaky:
            acc = jnp.where(acc >= 0, acc, shift(acc, 3))
        out = jnp.clip(shift(acc, out_shift), INT8_MIN, INT8_MAX)
        out_ref[0, r] = out.astype(jnp.int8)
        return 0

    jax.lax.fori_loop(0, th, row_body, 0)


def int8_conv3x3_requant(x_q: jnp.ndarray, w_q: jnp.ndarray,
                         b_q: jnp.ndarray, *, sw: int, sb: int,
                         sa_in: int, sa_out: int, retune: int,
                         leaky: bool = True, rounding: str = "nearest",
                         row_tile: Optional[int] = None,
                         interpret: bool = False) -> jnp.ndarray:
    """Fused int8 conv3x3(stride1,pad1) + requant: int8 in, int8 out.

    Args:
      x_q: [B, H, W, C_in] int8 activations at scale 2^sa_in.
      w_q: [3, 3, C_in, C_out] int8 weights at scale 2^sw.
      b_q: [C_out] int8-valued bias at scale 2^sb.
      shifts per yolo_tpu.quant.fixed_point semantics.
    Returns [B, H, W, C_out] int8 at scale 2^sa_out.
    """
    b, h, w, c_in = x_q.shape
    c_out = w_q.shape[-1]
    th = row_tile or max(1, min(16, h))
    while h % th:
        th -= 1

    # pad spatially (the kernel reads [th+2, W+2] windows); the padded
    # width is rounded up to 32 — HBM DMA slices must be tile-aligned in
    # the sublane dim.
    wp = -(-(w + 2) // 32) * 32
    x_pad = jnp.pad(x_q, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))
    w_taps = w_q.reshape(9, c_in, c_out)
    # bias at retune scale, computed exactly in int32 on the host graph
    bofs = sb - retune
    b32 = b_q.astype(jnp.int32)
    if bofs <= 0:
        bias_rt = b32 * (1 << -bofs)
    else:
        off = 1 << (bofs - 1)
        bias_rt = jnp.sign(b32) * ((jnp.abs(b32) + off) >> bofs)
        if rounding == "floor":
            bias_rt = b32 >> bofs
    bias_rt = bias_rt.reshape(1, c_out)

    acc_shift = sa_in + sw - retune
    out_shift = retune - sa_out

    kernel = functools.partial(
        _conv_kernel, th=th, w_out=w, c_in=c_in, c_out=c_out,
        acc_shift=acc_shift, out_shift=out_shift, leaky=leaky,
        rounding=rounding)

    flops = 2 * b * h * w * c_in * c_out * 9
    return pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # x stays in HBM
            pl.BlockSpec((9, c_in, c_out),
                         lambda bb, ii: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda bb, ii: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, c_out),
                               lambda bb, ii: (bb, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c_out), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((th + 2, wp, c_in), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x_q.size + w_q.size +
            b * h * w * c_out, transcendentals=0),
        interpret=interpret,
    )(x_pad, w_taps, bias_rt)
