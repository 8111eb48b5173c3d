"""Integer INT8 inference engine: the c_embedding/yolo_forward.c
equivalent, as XLA integer ops (+ a numpy oracle for bit-exactness tests).

Fixed-point model (per conv layer l), mirroring the hardware shift
programming in set_quantize_scale (c_embedding/yolo_forward.c:233-257):

  inputs  a_q : int8, value ~ real * 2^sa_in
  weights w_q : int8, value ~ real * 2^sw
  bias    b_q : int8, value ~ real * 2^sb

  acc32 = conv(a_q, w_q)                  # int32, scale 2^(sa_in+sw)
  acc16 = shift(acc32, sa_in + sw - retune)   # 'iofs', -> scale 2^retune
  acc16 += shift(b_q, sb - retune)            # 'bofs'
  [int16 saturation — retune is chosen so |acc16| < 2^15]
  act   = leaky: negative values >> 3         # slope 0.125 = 2^-3
  pool  = 2x2 max pool (if the layer has one)
  out8  = shift(acc16_act, retune - sa_out)   # 'oofs', -> scale 2^sa_out
  [int8 saturation]

``rounding='nearest'`` uses round-half-away shifts (better accuracy);
``'floor'`` is the arithmetic-shift behavior of the FPGA datapath. All
implementations (XLA graph, numpy oracle, Pallas kernel) share the exact
same integer formula and are bit-comparable.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.models.slim_yolo_v2 import CONV_LAYERS
from yolo_tpu.quant import quantize as q
from yolo_tpu.quant.qsim import QUANT_LAYER_NAMES, TRACKER_NAMES

INT16_MIN, INT16_MAX = -(2 ** 15), 2 ** 15 - 1
INT8_MIN, INT8_MAX = -128, 127


@dataclass
class Int8Model:
    """Quantized slim_yolo_v2: int8 tensors + per-layer shift exponents.

    The exponent tables (sw/sb/sa/retune) are exactly what the reference C
    engine hardcodes (c_embedding/yolo_forward.c:32-35)."""
    w_q: Dict[str, jnp.ndarray]     # int8 HWIO
    b_q: Dict[str, jnp.ndarray]     # int32 (int8-valued)
    sw: Dict[str, int]
    sb: Dict[str, int]
    sa: Dict[str, int]              # tracker name -> exponent (11 entries)
    retune: Dict[str, int]


def quantize_model(params_fused, tracker_states, retune: Dict[str, int],
                   bitwidth: int = 8,
                   weight_bitwidth: int = None,
                   per_channel: bool = False) -> Int8Model:
    """BN-fused float params + calibrated trackers + retune table ->
    integer model.

    ``weight_bitwidth``: quantize weights at a narrower width (e.g. 4)
    while bias/activations stay at ``bitwidth``. The b-bit levels are a
    subset of int8, so the engines and export formats are unchanged —
    only the per-layer sw exponents shift.

    ``per_channel``: per-output-channel pow2 weight scales — sw becomes
    an int32 [C_out] array per layer and the iofs requant shift runs as
    a per-channel epilogue op (_shift_arr). TPU-serving only: the
    weight.h shift-chain export stays per-tensor
    (retune_bias_quantize.py:73-86)."""
    from yolo_tpu.quant.qsim import activation_scale_exponents

    wb = weight_bitwidth or bitwidth
    w_axis = -1 if per_channel else None
    params_fused = jax.device_get(params_fused)  # one transfer; np math
    w_q, b_q, sw, sb = {}, {}, {}, {}
    for name in QUANT_LAYER_NAMES:
        wq, sw[name] = q.quantize_pow2_np(params_fused[name]["w"], wb,
                                          channel_axis=w_axis)
        bq, sb[name] = q.quantize_pow2_np(params_fused[name]["b"], bitwidth)
        w_q[name] = np.clip(wq, INT8_MIN, INT8_MAX).astype(np.int8)
        b_q[name] = np.clip(bq, INT8_MIN, INT8_MAX).astype(np.int32)
    sa = activation_scale_exponents(tracker_states)
    return Int8Model(w_q=w_q, b_q=b_q, sw=sw, sb=sb, sa=sa,
                     retune=dict(retune))


# ---------------------------------------------------------------------------
# Shared integer helpers (jnp and np share the same code via the xp arg).
# ---------------------------------------------------------------------------


def _shift_arr(v, s, rounding: str, xp):
    """Per-channel variant of _shift: ``s`` is an int32 array
    broadcastable to v (e.g. shape [C] against an NHWC accumulator).
    Mixed signs are fine — negative entries left-shift (exact), shifts
    >= 31 collapse to the same degenerate 0/-1 the scalar path gives."""
    s = xp.asarray(s, xp.int32)
    left = xp.left_shift(v, xp.maximum(-s, 0))
    sp = xp.minimum(xp.maximum(s, 0), 31)
    if rounding == "floor":
        right = xp.right_shift(v, sp)
    else:
        off = xp.left_shift(xp.ones_like(v), xp.maximum(sp - 1, 0))
        right = xp.right_shift(v + off - (v < 0).astype(v.dtype), sp)
        right = xp.where(s >= 31, xp.zeros_like(v), right)
    return xp.where(s <= 0, left, right)


def _shift(v, s, rounding: str, xp):
    """Multiply by 2^-s in integer arithmetic. s may be negative (left
    shift, exact) or an int array (per-channel scales, _shift_arr)."""
    if not isinstance(s, (int, np.integer)):
        return _shift_arr(v, s, rounding, xp)
    if s == 0:
        return v
    if s < 0:
        return v * (1 << (-s))
    if s >= 32:
        # int32 domain: |v| < 2^31 <= 2^(s-1), so the rounded result is
        # exactly 0 (floor: 0 or -1 by sign). Shift-by->=bitwidth is UB
        # in XLA and the 2^(s-1) offset would overflow int32; such
        # shifts only arise from degenerate (e.g. random-weight)
        # calibrations whose activations decay layer over layer.
        if rounding == "floor":
            return xp.right_shift(v, 31)
        return xp.zeros_like(v)
    if rounding == "floor":
        return xp.right_shift(v, s)
    # round-half-away-from-zero without abs/sign/mul (3 VPU ops, not 5):
    # v>=0: (v + 2^(s-1)) >> s  == sign*((|v|+off)>>s)
    # v<0 : (v + 2^(s-1) - 1) >> s == -((|v|+off)>>s)   [>> arithmetic]
    offset = 1 << (s - 1)
    return xp.right_shift(v + offset - (v < 0).astype(v.dtype), s)


def _leaky_int(v, rounding: str, xp):
    """LeakyReLU(0.125) as an arithmetic shift on negatives."""
    return xp.where(v >= 0, v, _shift(v, 3, rounding, xp))


def _leaky_int_slope(v, slope: float, rounding: str, xp):
    """Integer LeakyReLU at an arbitrary slope.

    0.125 keeps the reference's pure arithmetic shift. Other slopes
    (the darknet BACKBONES use 0.1 — blocks.BACKBONE_LEAKY_SLOPE, which
    the r3 engines approximated with the 0.125 shift at a measured
    ~2-mAP cost on tiny_yolo_v3) use the Q16 rational
    round(slope*65536)/65536 — error 0.006% for 0.1, exact integer
    arithmetic, int32-safe for the int16-clipped accumulator. The same
    one-multiplier concession int_upsample2x_ac already makes for the
    FPN models; slim stays all-0.125 (bit-frozen vs the C engine)."""
    if slope == 0.125:
        return _leaky_int(v, rounding, xp)
    num = int(round(slope * 65536))
    p = v.astype(xp.int32) * num if xp is jnp else v.astype(np.int64) * num
    neg = _shift(p, 16, rounding, xp)
    return xp.where(v >= 0, v, neg.astype(v.dtype))


def _maxpool_int_np(x):
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


# ---------------------------------------------------------------------------
# XLA integer graph.
# ---------------------------------------------------------------------------


def quantize_input(x: jnp.ndarray, sa_in: int) -> jnp.ndarray:
    """float (normalized) image -> int8 at scale 2^sa_in."""
    return jnp.clip(jnp.round(x * (2.0 ** sa_in)), INT8_MIN, INT8_MAX
                    ).astype(jnp.int8)


def _s2d_phase_weights(w_q: np.ndarray, c_in: int, c_out: int) -> np.ndarray:
    """[3,3,C_in,C_out] conv weights -> [2,2,4*C_in,4*C_out] block-conv
    weights over the space-to-depth input, one output group per pool
    phase (trace-time constant; zeros where the 3x3 support doesn't
    reach)."""
    w4 = np.zeros((2, 2, 4 * c_in, 4 * c_out), w_q.dtype)
    for a in range(2):          # pool phase row (y row = 2u+a)
        for bph in range(2):    # pool phase col
            for j in range(3):  # 3x3 tap
                for k in range(3):
                    m_, n_ = a + j, bph + k   # position in the 4x4 window
                    r_, py = divmod(m_, 2)    # block offset / pixel-in-block
                    s_, px = divmod(n_, 2)
                    ci = (py * 2 + px) * c_in
                    co = (a * 2 + bph) * c_out
                    w4[r_, s_, ci:ci + c_in, co:co + c_out] = w_q[j, k]
    return w4


def int8_conv_pool_s2d(x_q: jnp.ndarray, w_q, b_q, *, sw: int, sb: int,
                       sa_in: int, sa_out: int, retune: int,
                       leaky: bool = True,
                       rounding: str = "nearest") -> jnp.ndarray:
    """Fused int8 conv3x3(s1,p1) + requant + 2x2/2 maxpool via
    space-to-depth, computed AT POOLED RESOLUTION on the MXU.

    XLA executes small-C_in int8 convs on the VPU (docs/PERFORMANCE.md
    finding #1) — conv1's C_in=3 contraction can't tile onto the MXU.
    Space-to-depth (factor 2) turns the stride-2 pool structure into
    channels: the four conv outputs inside one pool window all read the
    same 4x4 input patch = a 2x2 window of s2d blocks, so conv+pool
    becomes ONE 2x2 conv over [B,H/2+3,W/2+3,4*C_in] with 4*C_out
    phase-packed outputs (contraction 16*C_in instead of C_in) followed
    by a channel-group max. Bit-exact with conv+requant+pool: the
    requant chain is monotone, so the phase max commutes with it.

    This is the TPU shape of the reference accelerator's fused
    conv+pool pass (c_embedding/yolo_forward.c:269-418, 'pool' bit).
    """
    b, h, w, c_in = x_q.shape
    if h % 2 or w % 2:
        raise ValueError("pooled conv requires even H, W")
    x2 = s2d_input(x_q)
    return int8_conv_pool_s2d_core(
        x2, w_q, b_q, c_in=c_in, sw=sw, sb=sb, sa_in=sa_in,
        sa_out=sa_out, retune=retune, leaky=leaky, rounding=rounding)


def check_serving_input(images, cfg, input_s2d: bool = False) -> None:
    """Trace-time shape/dtype validation for the serving detect fns.

    Raises a clear ValueError on the first call instead of letting a
    mismatched input surface as a broadcast error deep in decode."""
    h, w = cfg.input_size
    if images.ndim != 4:
        raise ValueError(
            f"detect expects a batched [B, H, W, C] input; got shape "
            f"{images.shape}")
    if input_s2d and images.dtype == jnp.int8:
        want = (h // 2 + 3, w // 2 + 3, 12)
        if tuple(images.shape[1:]) != want:
            raise ValueError(
                f"int8 s2d input for input_size {h}x{w} must be "
                f"[B, {want[0]}, {want[1]}, {want[2]}] (the padded "
                f"space-to-depth layout from fp.s2d_input_np or the "
                f"native preprocessor's layout='s2d'); got "
                f"{tuple(images.shape)}. For plain NHWC input rebuild "
                f"the detect fn without input_s2d.")
        return
    if tuple(images.shape[1:]) != (h, w, 3):
        raise ValueError(
            f"images are {tuple(images.shape[1:])} but this detect fn "
            f"was built for input_size {h}x{w} (expected [B, {h}, {w}, "
            f"3]); rebuild with cfg.with_input_size(...) or resize the "
            f"batch")


def s2d_input(x_q: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,C] int8 -> padded space-to-depth [B,H/2+3,W/2+3,4*C].

    Pad 3 so the pool-window base row 2u-1 lands on an even (block)
    offset; channel order inside a block is (py, px, c). The native
    preprocessor can emit this layout directly (layout='s2d'), making
    the transform free on device.
    """
    b, h, w, c_in = x_q.shape
    xp = jnp.pad(x_q, ((0, 0), (3, 3), (3, 3), (0, 0)))
    hb, wb = (h + 6) // 2, (w + 6) // 2
    return xp.reshape(b, hb, 2, wb, 2, c_in).transpose(
        0, 1, 3, 2, 4, 5).reshape(b, hb, wb, 4 * c_in)


def s2d_input_np(x_q: np.ndarray) -> np.ndarray:
    """Numpy twin of s2d_input (host-side layout for serving input)."""
    b, h, w, c_in = x_q.shape
    xp = np.pad(x_q, ((0, 0), (3, 3), (3, 3), (0, 0)))
    hb, wb = (h + 6) // 2, (w + 6) // 2
    return np.ascontiguousarray(
        xp.reshape(b, hb, 2, wb, 2, c_in).transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, hb, wb, 4 * c_in))


def int8_conv_pool_s2d_core(x2: jnp.ndarray, w_q, b_q, *, c_in: int,
                            sw: int, sb: int, sa_in: int, sa_out: int,
                            retune: int, leaky: bool = True,
                            rounding: str = "nearest") -> jnp.ndarray:
    """conv+requant+pool on an already space-to-depth input
    [B,H/2+3,W/2+3,4*C_in] (see int8_conv_pool_s2d)."""
    b, hb, wb, _ = x2.shape
    ho, wo = hb - 3, wb - 3
    c_out = w_q.shape[-1]

    w4 = jnp.asarray(_s2d_phase_weights(np.asarray(w_q), c_in, c_out))
    acc = jax.lax.conv_general_dilated(
        x2, w4, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)  # [B, hb-1, wb-1, 4*C_out]

    b4 = jnp.tile(b_q.astype(jnp.int32), 4)
    acc = _shift(acc, sw + sa_in - retune, rounding, jnp)
    acc = acc + _shift(b4, sb - retune, rounding, jnp)
    acc = jnp.clip(acc, INT16_MIN, INT16_MAX)
    if leaky:
        slope = 0.125 if leaky is True else float(leaky)
        acc = _leaky_int_slope(acc, slope, rounding, jnp)
    o8 = jnp.clip(_shift(acc, retune - sa_out, rounding, jnp),
                  INT8_MIN, INT8_MAX).astype(jnp.int8)
    # pooled (u,v) lives at conv output (u+1, v+1); max the 4 phase groups
    o8 = o8[:, 1:1 + ho, 1:1 + wo, :]
    z = o8[..., :c_out]
    for p in range(1, 4):
        z = jnp.maximum(z, o8[..., p * c_out:(p + 1) * c_out])
    return z


def _pack_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] int8 -> [B/4, 2(H+1), 2(W+1), C]: four images tiled
    2x2 in one spatial plane with one-pixel ZERO gutters between and
    after them. A 3x3 SAME conv on the packed plane is then bit-exact
    per image: every cross-image tap lands on a gutter zero — exactly
    the zero padding the per-image conv would have read. (M-packing:
    quadruples the conv's spatial rows per batch element so XLA tiles
    the small 26² tail of slim_yolo_v2 with less padding waste.)"""
    b, h, w, c = x.shape
    assert b % 4 == 0, f"pack_tail needs batch % 4 == 0, got {b}"
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    xp = xp.reshape(b // 4, 2, 2, h + 1, w + 1, c)
    xp = xp.transpose(0, 1, 3, 2, 4, 5)
    return xp.reshape(b // 4, 2 * (h + 1), 2 * (w + 1), c)


def _unpack_2x2(y: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Inverse of _pack_2x2 (drops the gutters)."""
    b4, hp, wp, c = y.shape
    y = y.reshape(b4, 2, hp // 2, 2, wp // 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b4 * 4, hp // 2, wp // 2, c)[:, :h, :w]


def _gutter_mask(hp: int, wp: int) -> np.ndarray:
    """int8 [1, hp, wp, 1] mask that re-zeroes the gutter rows/cols
    (a conv's bias makes them nonzero; the NEXT conv must read zeros
    there for per-image SAME-padding semantics)."""
    mask = np.ones((1, hp, wp, 1), np.int8)
    mask[:, hp // 2 - 1] = 0
    mask[:, hp - 1] = 0
    mask[:, :, wp // 2 - 1] = 0
    mask[:, :, wp - 1] = 0
    return mask


def int8_forward(m: Int8Model, x_q: jnp.ndarray,
                 rounding: str = "nearest",
                 s2d_layers: tuple = (),
                 layer_impls=None,
                 input_s2d: bool = False,
                 pack_tail: bool = False) -> jnp.ndarray:
    """int8 input [B, H, W, 3] -> float head output [B, H/16, W/16, C].

    All conv arithmetic is int8 x int8 -> int32 on the MXU
    (preferred_element_type=int32); everything else is integer VPU work
    that XLA fuses between the convs.

    ``s2d_layers``: names of pool layers to run through the fused
    space-to-depth conv+pool path (int8_conv_pool_s2d) — bit-exact,
    moves small-C_in layers from the VPU onto the MXU.

    ``layer_impls``: optional {name: fn} overriding a pool layer's whole
    conv+requant+pool with a custom bit-exact implementation (same
    keyword signature as int8_conv_pool_s2d) — the hook the Pallas
    pooled-window kernel plugs into for A/B benchmarking.

    ``input_s2d``: ``x_q`` is already the padded space-to-depth layout
    [B,H/2+3,W/2+3,12] (from s2d_input / the native preprocessor's
    layout='s2d'): conv1 runs the fused MXU conv+pool directly and the
    on-device transform cost disappears — the fastest serving input
    path.

    ``pack_tail``: run the 26² tail (conv5..pred) with four images
    packed 2x2 into one 54² spatial plane (zero gutters; bit-exact —
    see _pack_2x2). M-packing experiment, VERDICT r3 next #8. Requires
    batch % 4 == 0.
    """
    out = x_q
    names = list(TRACKER_NAMES)  # in, conv1..conv7(pred names), pred
    pools = {name: pool for name, _, _, pool in CONV_LAYERS}
    if any(np.ndim(s) for s in m.sw.values()) and (
            s2d_layers or input_s2d or pack_tail or layer_impls):
        raise ValueError(
            "per-channel weight scales run on the plain conv path only "
            "(the s2d/pack/pallas forms phase-pack C_out and would need "
            "tiled sw tables); rebuild the detect fn without "
            "s2d_layers/input_s2d/pack_tail/layer_impls")
    tail_hw = None
    mask = None
    for i, name in enumerate(QUANT_LAYER_NAMES):
        sa_in = m.sa[names[i]]
        sa_out = m.sa[names[i + 1]]
        r = m.retune[name]
        if pack_tail and name == "conv5":
            tail_hw = (out.shape[1], out.shape[2])
            out = _pack_2x2(out)
            mask = jnp.asarray(_gutter_mask(out.shape[1], out.shape[2]))
        if input_s2d and i == 0:
            out = int8_conv_pool_s2d_core(
                out, m.w_q[name], m.b_q[name], c_in=3, sw=m.sw[name],
                sb=m.sb[name], sa_in=sa_in, sa_out=sa_out, retune=r,
                leaky=True, rounding=rounding)
            continue
        impl = (layer_impls or {}).get(name)
        if impl is None and name in s2d_layers and pools.get(name):
            impl = int8_conv_pool_s2d
        if impl is not None and pools.get(name):
            out = impl(
                out, m.w_q[name], m.b_q[name], sw=m.sw[name],
                sb=m.sb[name], sa_in=sa_in, sa_out=sa_out, retune=r,
                leaky=True, rounding=rounding)
            continue
        acc = jax.lax.conv_general_dilated(
            out.astype(jnp.int8), m.w_q[name],
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        acc = _shift(acc, m.sw[name] + sa_in - r, rounding, jnp)
        acc = acc + _shift(m.b_q[name], m.sb[name] - r, rounding, jnp)
        acc = jnp.clip(acc, INT16_MIN, INT16_MAX)  # int16 accumulator
        if name != "pred":
            acc = _leaky_int(acc, rounding, jnp)
        out = _shift(acc, r - sa_out, rounding, jnp)
        out = jnp.clip(out, INT8_MIN, INT8_MAX).astype(jnp.int8)
        if mask is not None:
            if name == "pred":
                out = _unpack_2x2(out, *tail_hw)
            else:
                # re-zero the gutters (the conv bias made them nonzero);
                # a {0,1} int8 multiply fuses into the requant epilogue
                out = out * mask
        # NOTE: pooling stays AFTER requant (int8). Max commutes with the
        # monotone requant chain either way, but XLA fuses the requant
        # into the conv epilogue while an int32 reduce_window before it
        # forces an int32 HBM round-trip (~2ms/batch slower on conv1,
        # measured on v5e).
        if name != "pred" and pools[name]:
            out = jax.lax.reduce_window(
                out, jnp.int8(INT8_MIN), jax.lax.max,
                (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    # dequantize the head to float for decode
    return out.astype(jnp.float32) * (2.0 ** -m.sa["pred"])


def int8_forward_diagnostics(m: Int8Model, x_q: jnp.ndarray,
                             rounding: str = "nearest"):
    """int8 forward that also reports per-layer accumulator saturation.

    The runtime fault-detection equivalent of the reference's find-mode
    asserts (models/slim_yolo_v2.py:222-227): instead of crashing, it
    returns (head, overflow) where overflow maps layer name -> count of
    accumulator values that hit the int16 clamp this batch. Any nonzero
    count means the retune table is too aggressive for this input
    distribution.
    """
    out = x_q
    names = list(TRACKER_NAMES)
    pools = {name: pool for name, _, _, pool in CONV_LAYERS}
    overflow = {}
    for i, name in enumerate(QUANT_LAYER_NAMES):
        sa_in, sa_out = m.sa[names[i]], m.sa[names[i + 1]]
        r = m.retune[name]
        acc = jax.lax.conv_general_dilated(
            out.astype(jnp.int8), m.w_q[name],
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        acc = _shift(acc, m.sw[name] + sa_in - r, rounding, jnp)
        acc = acc + _shift(m.b_q[name], m.sb[name] - r, rounding, jnp)
        overflow[name] = jnp.sum(
            (acc > INT16_MAX) | (acc < INT16_MIN)).astype(jnp.int32)
        acc = jnp.clip(acc, INT16_MIN, INT16_MAX)
        if name != "pred":
            acc = _leaky_int(acc, rounding, jnp)
        out = jnp.clip(_shift(acc, r - sa_out, rounding, jnp),
                       INT8_MIN, INT8_MAX).astype(jnp.int8)
        if name != "pred" and pools[name]:
            out = jax.lax.reduce_window(
                out, jnp.int8(INT8_MIN), jax.lax.max,
                (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    head = out.astype(jnp.float32) * (2.0 ** -m.sa["pred"])
    return head, overflow


def int8_forward_pallas(m: Int8Model, x_q: jnp.ndarray,
                        rounding: str = "nearest",
                        interpret: bool = False) -> jnp.ndarray:
    """Same integer semantics as int8_forward, but each conv+requant layer
    runs as one fused Pallas MXU kernel (yolo_tpu.kernels.int8_conv) —
    int32 accumulators never touch HBM. Bit-exact with int8_forward and
    the numpy oracle. Pooling stays as an XLA int8 reduce_window between
    kernels (max-pool commutes with the monotonic requant)."""
    from yolo_tpu.kernels.int8_conv import int8_conv3x3_requant

    out = x_q
    names = list(TRACKER_NAMES)
    pools = {name: pool for name, _, _, pool in CONV_LAYERS}
    for i, name in enumerate(QUANT_LAYER_NAMES):
        out = int8_conv3x3_requant(
            out, m.w_q[name], m.b_q[name],
            sw=m.sw[name], sb=m.sb[name],
            sa_in=m.sa[names[i]], sa_out=m.sa[names[i + 1]],
            retune=m.retune[name], leaky=(name != "pred"),
            rounding=rounding, interpret=interpret)
        if name != "pred" and pools[name]:
            out = jax.lax.reduce_window(
                out, jnp.int8(INT8_MIN), jax.lax.max,
                (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return out.astype(jnp.float32) * (2.0 ** -m.sa["pred"])


# ---------------------------------------------------------------------------
# Space-to-depth forms of stride-2 convs (darknet53-style backbones).
#
# XLA executes small-C_in int8 convs on the VPU (docs/PERFORMANCE.md
# finding #1). A 3x3 stride-2 conv reads a 3x3 window at even offsets —
# in space-to-depth coordinates that is a 2x2 window of 2x2-pixel
# blocks, so the conv becomes a 2x2 block conv with contraction 16*C_in
# that tiles onto the MXU. A stride-1 conv immediately followed by a
# stride-2 conv (the darknet entry pair) stays entirely in s2d space:
# conv1 emits phase-packed s2d output (2 row phases x 2 col phases) and
# conv2 consumes it directly, so no depth-to-space ever materializes.
# All forms are bit-exact with the plain conv (zero-padded weights
# contribute exact zeros in integer arithmetic).
# ---------------------------------------------------------------------------


def _requant(acc, b_q, *, sw, sb, sa_in, sa_out, retune, leaky, rounding):
    """The standard fixed-point requant chain on a raw int32 conv
    accumulator. ``leaky``: False | True (slope 0.125) | a float slope
    (integer Q16 rational, _leaky_int_slope)."""
    acc = _shift(acc, sw + sa_in - retune, rounding, jnp)
    acc = acc + _shift(b_q.astype(jnp.int32), sb - retune, rounding, jnp)
    acc = jnp.clip(acc, INT16_MIN, INT16_MAX)
    if leaky:
        slope = 0.125 if leaky is True else float(leaky)
        acc = _leaky_int_slope(acc, slope, rounding, jnp)
    out = _shift(acc, retune - sa_out, rounding, jnp)
    return jnp.clip(out, INT8_MIN, INT8_MAX).astype(jnp.int8)


def _s2d_blocks(xp: jnp.ndarray) -> jnp.ndarray:
    """[B, H', W', C] (even dims) -> [B, H'/2, W'/2, 4C], block channel
    order (py, px, c)."""
    b, hp, wp_, c = xp.shape
    return xp.reshape(b, hp // 2, 2, wp_ // 2, 2, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(b, hp // 2, wp_ // 2, 4 * c)


def _s2_block_weights(w: np.ndarray, out_phases: bool) -> np.ndarray:
    """3x3 conv weights -> 2x2 block-conv weights over odd-aligned s2d
    input (x padded 1; block s = pixels {2s-1, 2s}).

    out_phases=False: plain stride-2 conv, output tap j = 2r+py.
    out_phases=True: stride-1 conv emitting BOTH row/col phases
    (output group (a, b) is y[2t+a, 2s+b]), tap j = 2r+py-a.
    """
    c_in, c_out = w.shape[2], w.shape[3]
    n_ph = 4 if out_phases else 1
    w4 = np.zeros((2, 2, 4 * c_in, n_ph * c_out), w.dtype)
    for r in range(2):
        for s in range(2):
            for py in range(2):
                for px in range(2):
                    ci = (py * 2 + px) * c_in
                    for a in range(2 if out_phases else 1):
                        for bb in range(2 if out_phases else 1):
                            j, k = 2 * r + py - a, 2 * s + px - bb
                            if not (0 <= j <= 2 and 0 <= k <= 2):
                                continue
                            co = ((a * 2 + bb) * c_out
                                  if out_phases else 0)
                            w4[r, s, ci:ci + c_in,
                               co:co + c_out] = w[j, k]
    return w4


def _even_block_weights(w: np.ndarray) -> np.ndarray:
    """3x3 stride-2 conv weights -> 2x2 block-conv weights over an
    EVEN-aligned, zero-block-padded s2d input (block t = rows
    {2t, 2t+1}; tap j = 2r+a-1) — the form that consumes the entry
    pair's phase-packed intermediate directly."""
    c4, c_out = w.shape[2] * 4, w.shape[3]
    c_in = w.shape[2]
    w4 = np.zeros((2, 2, c4, c_out), w.dtype)
    for r in range(2):
        for s in range(2):
            for a in range(2):
                for bb in range(2):
                    j, k = 2 * r + a - 1, 2 * s + bb - 1
                    if not (0 <= j <= 2 and 0 <= k <= 2):
                        continue
                    ci = (a * 2 + bb) * c_in
                    w4[r, s, ci:ci + c_in, :] = w[j, k]
    return w4


def _block_conv(x2, w4):
    return jax.lax.conv_general_dilated(
        x2, jnp.asarray(w4), window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def int8_conv_stride2_s2d(x_q, w_q, b_q, *, sw: int, sb: int, sa_in: int,
                          sa_out: int, retune: int, leaky: bool = True,
                          rounding: str = "nearest") -> jnp.ndarray:
    """3x3 stride-2 pad-1 int8 conv as a 2x2 block conv over the
    space-to-depth input (contraction 16*C_in on the MXU). Bit-exact
    with int_conv_requant(stride=2, padding=1)."""
    b, h, w, c = x_q.shape
    if h % 2 or w % 2:
        raise ValueError("stride-2 s2d conv requires even H, W")
    xp = jnp.pad(x_q, ((0, 0), (1, 1), (1, 1), (0, 0)))
    x2 = _s2d_blocks(xp)                       # [B, h/2+1, w/2+1, 4C]
    acc = _block_conv(x2, _s2_block_weights(np.asarray(w_q), False))
    return _requant(acc, b_q, sw=sw, sb=sb, sa_in=sa_in, sa_out=sa_out,
                    retune=retune, leaky=leaky, rounding=rounding)


def s2d_entry_from_input(x2: jnp.ndarray) -> jnp.ndarray:
    """Serving s2d layout [B,H/2+3,W/2+3,4C] (s2d_input / native
    layout='s2d') -> the odd-aligned entry-pair layout [B,H/2+1,W/2+1,4C]
    that int8_entry_pair_s2d consumes (``_s2d_blocks(pad1(x))``).

    Block algebra: serving block k holds original rows (2k-3, 2k-2)
    (pad 3), the odd-aligned block m holds rows (2m-1, 2m) (pad 1) —
    identical content at k = m+1, and the pad-3 zeros cover the pad-1
    zeros exactly, so the slice [1:-1] converts losslessly. One host
    layout therefore feeds BOTH the pooled conv1 form (slim/tiny/v2) and
    the darknet entry pair (v3): the preprocessor never needs to know the
    model family.
    """
    return x2[:, 1:-1, 1:-1, :]


def int8_entry_pair_s2d(x_q, w1, b1, p1: dict, w2, b2, p2: dict,
                        rounding: str = "nearest",
                        pre_s2d: bool = False,
                        leaky=(True, True)) -> jnp.ndarray:
    """Fused darknet entry: conv1 (3x3 s1 p1 leaky) + conv2 (3x3 s2 p1
    leaky), both as MXU block convs, the intermediate staying in
    phase-packed s2d layout (never depth-to-space'd).

    ``p1``/``p2`` carry the per-conv requant parameters
    (sw, sb, sa_in, sa_out, retune). Bit-exact with the sequential
    int_conv_requant pair: the phase-packed intermediate holds exactly
    the requantized y values, and conv2's zero padding is the s2d zero
    block pad.

    ``pre_s2d``: ``x_q`` is already the odd-aligned block layout
    [B, H/2+1, W/2+1, 4*C] (s2d_entry_from_input of a host-provided
    serving layout) — the relayout costs nothing on device.
    """
    if pre_s2d:
        x2 = x_q
        h2, w2_ = x2.shape[1] - 1, x2.shape[2] - 1
    else:
        b, h, w, c = x_q.shape
        if h % 2 or w % 2:
            raise ValueError("entry pair requires even H, W")
        xp = jnp.pad(x_q, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x2 = _s2d_blocks(xp)                   # odd-aligned blocks
        h2, w2_ = h // 2, w // 2
    acc1 = _block_conv(x2, _s2_block_weights(np.asarray(w1), True))
    y2 = _requant(acc1, jnp.tile(b1.astype(jnp.int32), 4),
                  leaky=leaky[0], rounding=rounding, **p1)
    y2p = jnp.pad(y2, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc2 = _block_conv(y2p, _even_block_weights(np.asarray(w2)))
    acc2 = acc2[:, :h2, :w2_]
    return _requant(acc2, b2, leaky=leaky[1], rounding=rounding, **p2)


# ---------------------------------------------------------------------------
# Generic integer ops (building blocks for integer graphs of the other
# model families; the slim engine above predates them and is kept
# bit-frozen against its oracle).
# ---------------------------------------------------------------------------


def int_conv_requant(x, w_q, b_q, *, sw: int, sb: int, sa_in, sa_out: int,
                     retune: int, padding: int = 0, stride: int = 1,
                     leaky: bool = True, rounding: str = "nearest",
                     residual=None, sa_res: int = None):
    """Integer conv + fixed-point requant, generalized.

    ``leaky``: False | True (slope 0.125, the reference shift) | a float
    slope (e.g. 0.1 for the darknet backbones — integer Q16 rational,
    see _leaky_int_slope).

    ``x`` is an int8 array with scale exponent ``sa_in`` — or, for convs
    that consume a channel concat of differently-scaled tensors, a list
    of (int8 array, sa) pairs: the conv splits along C_in and each
    partial accumulator is shifted to the retune scale before summing
    (exactly equivalent to the float sim's concat-then-conv).

    ``residual``: optional (r_q, sa_r) int8 skip tensor. The
    int_add_requant chain (align scales, int sum, requant to ``sa_res``)
    runs INSIDE this call, elementwise on the conv output — bit-exact
    with the separate add, but XLA fuses it into the conv epilogue so
    the conv's int8 output never round-trips through HBM. Measured on
    v5e @208² b64 the standalone 'res' op costs ~11 ms/batch in the
    fused v3 graph; the folded form removes that entirely
    (docs/PERFORMANCE.md v3 table).
    """
    parts = x if isinstance(x, (list, tuple)) else [(x, sa_in)]
    # accumulate raw int32 partials per shift amount, shift once per
    # group (same-scale branches are then exactly equivalent to a plain
    # conv over their concat). Per-channel sw is an int32 [C_out] array
    # (unhashable): group by the scalar input scale instead — branches
    # with the same sa then still share one (per-channel) shift.
    sw_pc = np.ndim(sw) > 0
    raw: dict = {}
    c_ofs = 0
    for xq, sa in parts:
        c = xq.shape[-1]
        w_part = jax.lax.slice_in_dim(w_q, c_ofs, c_ofs + c, axis=2)
        c_ofs += c
        p = jax.lax.conv_general_dilated(
            xq.astype(jnp.int8), w_part,
            window_strides=(stride, stride),
            padding=((padding, padding), (padding, padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        k = sa if sw_pc else sw + sa - retune
        raw[k] = p if k not in raw else raw[k] + p
    acc = None
    for k, p in raw.items():
        p = _shift(p, (sw + k - retune) if sw_pc else k, rounding, jnp)
        acc = p if acc is None else acc + p
    acc = acc + _shift(b_q.astype(jnp.int32), sb - retune, rounding, jnp)
    acc = jnp.clip(acc, INT16_MIN, INT16_MAX)
    if leaky:
        slope = 0.125 if leaky is True else float(leaky)
        acc = _leaky_int_slope(acc, slope, rounding, jnp)
    out = _shift(acc, retune - sa_out, rounding, jnp)
    out = jnp.clip(out, INT8_MIN, INT8_MAX).astype(jnp.int8)
    if residual is not None:
        r_q, sa_r = residual
        out = int_add_requant(out, sa_out, r_q, sa_r, sa_res, rounding)
    return out


def int_add_requant(a, sa_a: int, b, sa_b: int, sa_out: int,
                    rounding: str = "nearest"):
    """Residual add of two int8 tensors with different scales.

    Both operands shift (exactly, left) to the finer common scale, sum in
    int32, then requantize to ``sa_out`` (the sum's calibrated tracker
    scale) with int8 saturation.
    """
    s = max(sa_a, sa_b)
    va = a.astype(jnp.int32) << (s - sa_a)
    vb = b.astype(jnp.int32) << (s - sa_b)
    out = _shift(va + vb, s - sa_out, rounding, jnp)
    return jnp.clip(out, INT8_MIN, INT8_MAX).astype(jnp.int8)


def int_maxpool(x_q, window: int = 2, stride: int = 2, padding: int = 0):
    """int8 max pool; padding uses INT8_MIN (torch -inf semantics)."""
    if padding:
        x_q = jnp.pad(x_q, ((0, 0), (padding, padding),
                            (padding, padding), (0, 0)),
                      constant_values=INT8_MIN)
    return jax.lax.reduce_window(
        x_q, jnp.int8(INT8_MIN), jax.lax.max,
        (1, window, window, 1), (1, stride, stride, 1), "VALID")


def int_spp(x_q):
    """int8 SPP: concat [x, mp5, mp9, mp13] — max pools preserve the
    scale, so the concat is single-scale (reference utils/modules.py:
    59-72)."""
    return jnp.concatenate(
        [x_q, int_maxpool(x_q, 5, 1, 2), int_maxpool(x_q, 9, 1, 4),
         int_maxpool(x_q, 13, 1, 6)], axis=-1)


def int_zero_pad_maxpool_s1(x_q):
    """ZeroPad2d((0,1,0,1)) + MaxPool2d(2, stride=1) on int8 (the
    darknet_light tail pool, reference backbone/darknet.py:232-235).
    Zero-padding (not INT8_MIN) exactly as the reference pads."""
    x = jnp.pad(x_q, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return jax.lax.reduce_window(
        x, jnp.int8(INT8_MIN), jax.lax.max,
        (1, 2, 2, 1), (1, 1, 1, 1), "VALID")


def int_upsample2x_ac(x_q, rounding: str = "nearest"):
    """2x bilinear (align_corners=True) upsample of an int8 tensor,
    computed in f32 and requantized to the SAME scale exponent.

    The FPN interpolation weights are not powers of two, so a pure-shift
    datapath can't express it; a real deployment would use a small
    fixed-point multiplier here. Numerics: exact interpolation followed
    by one extra round-to-grid (the float sim keeps off-grid values)."""
    from yolo_tpu.ops import blocks

    up = blocks.upsample2x_align_corners(x_q.astype(jnp.float32))
    r = jnp.round(up) if rounding == "nearest" else jnp.floor(up)
    return jnp.clip(r, INT8_MIN, INT8_MAX).astype(jnp.int8)


# ---------------------------------------------------------------------------
# Numpy oracle (bit-exact reference implementation).
# ---------------------------------------------------------------------------


def _conv_int_np(x, w):
    """Naive padded int32 conv, NHWC x HWIO. Small sizes only (tests)."""
    b, h, wd, ci = x.shape
    kh, kw, _, co = w.shape
    xp = np.pad(x.astype(np.int32), ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = np.zeros((b, h, wd, co), np.int32)
    for dy in range(kh):
        for dx in range(kw):
            patch = xp[:, dy:dy + h, dx:dx + wd, :]
            out += np.einsum("bhwc,co->bhwo", patch,
                             w[dy, dx].astype(np.int32))
    return out


def int8_forward_numpy(m: Int8Model, x_q: np.ndarray,
                       rounding: str = "nearest") -> np.ndarray:
    """Bit-exact numpy oracle of int8_forward."""
    out = np.asarray(x_q, np.int32)
    names = list(TRACKER_NAMES)
    pools = {name: pool for name, _, _, pool in CONV_LAYERS}
    for i, name in enumerate(QUANT_LAYER_NAMES):
        sa_in, sa_out = m.sa[names[i]], m.sa[names[i + 1]]
        r = m.retune[name]
        acc = _conv_int_np(out, np.asarray(m.w_q[name]))
        acc = _shift(acc, m.sw[name] + sa_in - r, rounding, np)
        acc = acc + _shift(np.asarray(m.b_q[name], np.int32),
                           m.sb[name] - r, rounding, np)
        acc = np.clip(acc, INT16_MIN, INT16_MAX)
        if name != "pred":
            acc = _leaky_int(acc, rounding, np)
        out = np.clip(_shift(acc, r - sa_out, rounding, np),
                      INT8_MIN, INT8_MAX)
        if name != "pred" and pools[name]:
            out = _maxpool_int_np(out)
    return out.astype(np.float32) * (2.0 ** -m.sa["pred"])
