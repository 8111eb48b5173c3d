"""Pallas TPU kernel: fused int8 3x3 conv + fixed-point requantization.

This is the MXU-native replacement for the reference's FPGA conv
accelerator datapath (c_embedding/yolo_forward.c:575-770): one kernel
computes conv3x3 (stride 1, pad 1) as nine int8 matmuls with int32
accumulation in VMEM, then applies the hardware requantization chain
in-register — accumulator shift to the retune scale, bias add, int16
saturation, LeakyReLU-as-arithmetic-shift, output shift, int8
saturation — and writes int8. Activations live in HBM as int8 only; the
int32 accumulator never leaves VMEM.

Kernel structure (speed notes):
- The (row-tile x padded-width) plane is flattened to the matmul M dim,
  so each of the 9 taps is ONE large [th*wp, C_in] x [C_in, C_out] MXU
  matmul per grid step (not a per-row loop).
- Vertical taps come from three dy-shifted input views prepared in XLA
  (cheap int8 slices); horizontal taps are pltpu.roll by -dx on the
  flattened plane — wrapped elements land only in padding columns.
- Inputs/outputs use BlockSpec index maps, so Pallas double-buffers the
  HBM<->VMEM streams automatically (the ping-pong BRAMs of
  c_embedding/yolo_forward.c:259-267, done by the compiler).

The per-layer shift amounts are trace-time constants (the scale_w/
scale_a/retune exponent tables, c_embedding/yolo_forward.c:32-35), so
each layer compiles to a specialized kernel.

Status / measured on v5e (via the axon tunnel): bit-exact with the XLA
int8 graph and the numpy oracle on real hardware. Throughput is
currently behind the XLA conv path (~9.5 TOPS marginal vs ~30 TOPS
sustained for XLA int8 convs on this setup; per-dispatch tunnel latency
~4-7 ms pollutes small-kernel measurements), so the int8 graph defaults
to backend='xla' and this kernel is the reference native implementation
selectable with backend='pallas'.
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
    """Integer multiply by 2^-s, round-half-away (s static)."""
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


def _conv_kernel(x0_ref, x1_ref, x2_ref, w_ref, b_ref, out_ref, *,
                 nb: int, th: int, wp: int, c_in: int, c_out: int,
                 acc_shift: int, out_shift: int, leaky: bool,
                 rounding: str):
    """One grid step: rows [i*th, i*th+th) of ``nb`` images.

    x{0,1,2}_ref: [nb, th, wp, C_in] int8 — dy-shifted input views.
    w_ref: [3, C_in, 3*C_out] int8 — per-dy, the three dx-tap weights
      concatenated on the output dim (one wide MXU matmul per dy).
    b_ref: [1, C_out] int32 — bias already at the retune scale.
    out_ref: [nb, th, wp, C_out] int8 (padded width; caller crops).

    The (image, row, column) volume flattens into the matmul M dim; roll
    wrap-around between rows/images lands only in zero-padding columns,
    which the caller crops away.
    """
    shift = (_shift_round_nearest if rounding == "nearest"
             else _shift_floor)
    m = nb * th * wp

    acc = jnp.zeros((m, c_out), jnp.int32)
    for dy, x_ref in enumerate((x0_ref, x1_ref, x2_ref)):
        flat = x_ref[...].reshape(m, c_in)
        p3 = jax.lax.dot_general(
            flat, w_ref[dy],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [m, 3*C_out]: all three dx taps at once
        for dx in range(3):
            p = jax.lax.slice_in_dim(p3, dx * c_out, (dx + 1) * c_out,
                                     axis=1)
            # dot(roll(x, s), W) == roll(dot(x, W), s) (row permutation);
            # Mosaic only rotates 32-bit data, so roll the int32 product.
            # m-dx == -dx mod m (pltpu.roll needs shift >= 0).
            acc = acc + (p if dx == 0 else pltpu.roll(p, m - dx, axis=0))

    # requant chain (c_embedding/yolo_forward.c:233-257 semantics)
    acc = shift(acc, acc_shift) + b_ref[0][None, :]
    acc = jnp.clip(acc, INT16_MIN, INT16_MAX)  # int16 accumulator
    if leaky:
        acc = jnp.where(acc >= 0, acc, shift(acc, 3))
    out = jnp.clip(shift(acc, out_shift), INT8_MIN, INT8_MAX)
    out_ref[...] = out.astype(jnp.int8).reshape(nb, th, wp, c_out)


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

    # horizontal pad: wp >= w+2, multiple of 32 so int8 HBM slices and the
    # flattened sublane dim stay tile-aligned; extra columns are zeros and
    # absorb the roll wrap-around.
    wp = -(-(w + 2) // 32) * 32

    # tile sizes: target a large matmul M (= nb*th*wp) while keeping the
    # input block under ~1 MB of VMEM (before lane padding).
    if row_tile is None:
        row_tile = max(1, min(h, max(1, 8192 // max(wp, 1))))
    th = row_tile
    while h % th:
        th -= 1
    block_bytes = th * wp * max(c_in, 32)
    nb = max(1, min(b, (1 << 20) // max(block_bytes, 1),
                    8192 // max(th * wp, 1)))
    while b % nb:
        nb -= 1

    x_pad = jnp.pad(x_q, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))
    # three dy-shifted views (cheap int8 copies; enables non-overlapping
    # auto-pipelined blocks)
    views = [jax.lax.slice_in_dim(x_pad, dy, dy + h, axis=1)
             for dy in range(3)]

    # [3(dy), C_in, 3*C_out]: dx taps concatenated on the output dim
    w_taps = jnp.concatenate(
        [w_q[:, dx] for dx in range(3)], axis=-1)  # [3, C_in, 3*C_out]
    # bias at retune scale, computed exactly in int32 on the host graph
    bofs = sb - retune
    b32 = b_q.astype(jnp.int32)
    if bofs <= 0:
        bias_rt = b32 * (1 << -bofs)
    elif rounding == "floor":
        bias_rt = b32 >> bofs
    else:
        off = 1 << (bofs - 1)
        bias_rt = jnp.sign(b32) * ((jnp.abs(b32) + off) >> bofs)
    bias_rt = bias_rt.reshape(1, c_out)

    kernel = functools.partial(
        _conv_kernel, nb=nb, th=th, wp=wp, c_in=c_in, c_out=c_out,
        acc_shift=sa_in + sw - retune, out_shift=retune - sa_out,
        leaky=leaky, rounding=rounding)

    x_spec = pl.BlockSpec((nb, th, wp, c_in),
                          lambda bb, ii: (bb, ii, 0, 0),
                          memory_space=pltpu.VMEM)
    flops = 2 * b * h * wp * c_in * c_out * 9
    out_padded = pl.pallas_call(
        kernel,
        grid=(b // nb, h // th),
        in_specs=[
            x_spec, x_spec, x_spec,
            pl.BlockSpec((3, c_in, 3 * c_out), lambda bb, ii: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda bb, ii: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, th, wp, c_out),
                               lambda bb, ii: (bb, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wp, c_out), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=3 * b * h * wp * c_in + 9 * c_in * c_out +
            b * h * wp * c_out,
            transcendentals=0),
        interpret=interpret,
    )(views[0], views[1], views[2], w_taps, bias_rt)
    return jax.lax.slice_in_dim(out_padded, 0, w, axis=2)
