"""Core conv building blocks, NHWC / HWIO, as pure functions.

TPU-native equivalents of the reference's nn.Module blocks
(reference utils/modules.py:6-72):

- ``conv_block`` = Conv + BatchNorm + LeakyReLU(slope) fused at trace time
  (the BN is algebraically folded into a scale/offset on the conv output in
  inference form; training form keeps running stats explicitly in the
  parameter pytree — there is no module state in JAX).
- ``reorg`` = space-to-depth passthrough layer (utils/modules.py:43-57).
- ``spp``  = 5/9/13 max-pool pyramid concat (utils/modules.py:59-72).

Layout: activations are NHWC (TPU-preferred), weights are HWIO. The
reference is NCHW/OIHW torch; the checkpoint loader transposes.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# LeakyReLU slope used by every model-level conv block. 0.125 = 2^-3 so the
# FPGA implements it as an arithmetic right-shift by 3
# (reference utils/modules.py:14, c_embedding conv act path).
MODEL_LEAKY_SLOPE = 0.125
# Backbone (darknet) blocks use torch's default 0.1 slope
# (reference backbone/darknet.py:12-22).
BACKBONE_LEAKY_SLOPE = 0.1

_BN_EPS = 1e-5


def leaky_relu(x, slope=MODEL_LEAKY_SLOPE):
    return jnp.where(x >= 0, x, x * slope)


# ---------------------------------------------------------------------------
# Initialization (matches torch nn.Conv2d defaults: kaiming_uniform(a=√5)
# for weights, uniform(±1/√fan_in) for bias) so FP32 training from scratch
# behaves like the reference.
# ---------------------------------------------------------------------------


def init_conv(rng, ksize: int, c_in: int, c_out: int, bias: bool = True,
              dtype=jnp.float32):
    """Init a conv layer param dict: {'w': HWIO[, 'b': O]}."""
    k_w, k_b = jax.random.split(rng)
    fan_in = c_in * ksize * ksize
    gain = math.sqrt(2.0 / (1 + 5.0))  # kaiming_uniform(a=sqrt(5))
    bound = gain * math.sqrt(3.0 / fan_in)
    w = jax.random.uniform(
        k_w, (ksize, ksize, c_in, c_out), dtype, -bound, bound)
    params = {"w": w}
    if bias:
        b_bound = 1.0 / math.sqrt(fan_in)
        params["b"] = jax.random.uniform(
            k_b, (c_out,), dtype, -b_bound, b_bound)
    return params


def init_conv_block(rng, ksize: int, c_in: int, c_out: int,
                    batch_norm: bool = True, dtype=jnp.float32):
    """Init a Conv(+BN) block. With BN the conv has no bias and the block
    carries BN affine params + running stats (gamma/beta/mean/var)."""
    p = init_conv(rng, ksize, c_in, c_out, bias=not batch_norm, dtype=dtype)
    if batch_norm:
        p["bn"] = {
            "gamma": jnp.ones((c_out,), dtype),
            "beta": jnp.zeros((c_out,), dtype),
            "mean": jnp.zeros((c_out,), dtype),
            "var": jnp.ones((c_out,), dtype),
        }
    return p


# ---------------------------------------------------------------------------
# Forward ops.
# ---------------------------------------------------------------------------


_DEFAULT_PRECISION = "highest"


def conv2d(x, w, b=None, stride: int = 1, padding: int = 0,
           dilation: int = 1, preferred_element_type=None,
           precision=None):
    """Plain 2D conv, NHWC x HWIO -> NHWC.

    The default precision 'highest' keeps f32 inputs in true f32 (JAX's
    global default would round through bf16). Low-precision *speed* comes
    from feeding actual bf16/int8 operands (Detector(dtype=bfloat16)),
    never from silently degraded f32.
    """
    if precision is None:
        precision = _DEFAULT_PRECISION
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred_element_type,
        precision=precision,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def batch_norm_inference(x, bn):
    """Inference-mode BN using running stats (what eval/quantization see)."""
    inv = jax.lax.rsqrt(bn["var"].astype(jnp.float32) + _BN_EPS)
    scale = (bn["gamma"] * inv).astype(x.dtype)
    offset = (bn["beta"] - bn["gamma"] * bn["mean"] * inv).astype(x.dtype)
    return x * scale + offset


def batch_norm_train(x, bn, momentum: float = 0.1):
    """Training-mode BN over (N, H, W). Returns (y, new_running_stats).

    Running stats update matches torch BatchNorm2d: EMA with ``momentum`` on
    the *new* value and unbiased variance for the running estimate.
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(0, 1, 2))
    var = jnp.var(x32, axis=(0, 1, 2))
    n = x.shape[0] * x.shape[1] * x.shape[2]
    unbiased_var = var * (n / max(n - 1, 1))
    inv = jax.lax.rsqrt(var + _BN_EPS)
    y = (x32 - mean) * inv * bn["gamma"] + bn["beta"]
    new_bn = dict(
        bn,
        mean=(1 - momentum) * bn["mean"] + momentum * mean,
        var=(1 - momentum) * bn["var"] + momentum * unbiased_var,
    )
    return y.astype(x.dtype), new_bn


# Active quantization context (trace-time hook). When set, every
# conv_block output passes through an activation-range tracker tap —
# this is how the generic PTQ simulation instruments *any* model without
# per-model code (the reference instead hand-inserts AveragedRangeTracker
# modules into one model class, models/slim_yolo_v2.py:58-89).
_QUANT_TAP = None


class quantization_context:
    """``with quantization_context(tap): model.forward(...)`` — ``tap``
    is called with each conv block's activation (in call order) and
    returns the (fake-quantized) activation."""

    def __init__(self, tap):
        self.tap = tap

    def __enter__(self):
        global _QUANT_TAP
        self._prev = _QUANT_TAP
        _QUANT_TAP = self.tap
        return self.tap

    def __exit__(self, *exc):
        global _QUANT_TAP
        _QUANT_TAP = self._prev
        return False


def conv_block(params, x, stride: int = 1, padding: int = 0,
               slope: float = MODEL_LEAKY_SLOPE, train: bool = False):
    """Conv(+BN)+LeakyReLU block (reference utils/modules.py Conv2d /
    Conv2d_fuse). If the param dict has a 'bn' entry, BN runs; otherwise a
    plain biased conv (the BN-fused form). ``slope=None`` → ReLU.

    Returns y in inference mode, (y, new_params) in train mode with BN.
    """
    y = conv2d(x, params["w"], params.get("b"), stride=stride,
               padding=padding)
    new_params = None
    if "bn" in params:
        if train:
            y, new_bn = batch_norm_train(y, params["bn"])
            new_params = dict(params, bn=new_bn)
        else:
            y = batch_norm_inference(y, params["bn"])
    if _QUANT_TAP is not None and hasattr(_QUANT_TAP, "pre"):
        _QUANT_TAP.pre(y)  # pre-activation accumulator stats
    if slope is None:
        y = jnp.maximum(y, 0.0)
    else:
        y = leaky_relu(y, slope)
    if _QUANT_TAP is not None:
        y = _QUANT_TAP(y)
    if train:
        return y, (new_params if new_params is not None else params)
    return y


def s2d_pool_weights(w):
    """[3,3,C,Cout] conv weights -> [2,2,4C,4Cout] phase-packed block-conv
    weights over a space-to-depth input (trace-compatible, differentiable
    float analogue of quant.fixed_point._s2d_phase_weights: built from
    pad/reshape/concat so gradients flow back to ``w``)."""
    c_in, c_out = w.shape[2], w.shape[3]
    phases = []
    for a in range(2):          # pool phase row
        for b_ in range(2):     # pool phase col
            wp = jnp.pad(w, ((a, 1 - a), (b_, 1 - b_), (0, 0), (0, 0)))
            wp = wp.reshape(2, 2, 2, 2, c_in, c_out
                            ).transpose(0, 2, 1, 3, 4, 5)
            phases.append(wp.reshape(2, 2, 4 * c_in, c_out))
    return jnp.concatenate(phases, axis=-1)


def conv_block_pool_s2d(params, x, slope: float = MODEL_LEAKY_SLOPE,
                        train: bool = False):
    """conv3x3(s1,p1) + BN + LeakyReLU + 2x2/2 maxpool, computed AT
    POOLED RESOLUTION via space-to-depth — the float analogue of
    quant.fixed_point.int8_conv_pool_s2d.

    Small-C_in convs (conv1's C_in=3) can't tile onto the MXU and run on
    the VPU: conv1 alone is ~49% of slim's bf16 forward at 416² b128
    (5.3 of 10.8 ms, prefix-delta measured). Space-to-depth turns the
    pool structure into channels: conv+pool becomes one 2x2 block conv
    with contraction 16*C_in and 4*C_out phase-packed outputs, followed
    by BN/activation per phase and a channel-group max.

    Semantically EQUAL to conv_block(...) + max_pool(2,2) — the four
    phase groups together hold every full-resolution conv output exactly
    once, so BN train statistics, quantization taps (pre and post), and
    the activation see the same value multiset, and the phase max IS the
    2x2 pool — up to float summation order (not bit-identical; use for
    speed, not for torch-parity golden tests). Requires even H, W.
    """
    b, h, w_, c = x.shape
    c_out = params["w"].shape[-1]
    ho, wo = h // 2, w_ // 2
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    hb, wb = (h + 6) // 2, (w_ + 6) // 2
    x2 = xp.reshape(b, hb, 2, wb, 2, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(b, hb, wb, 4 * c)
    w4 = s2d_pool_weights(params["w"]).astype(x2.dtype)
    y = conv2d(x2, w4, None, padding=0)  # VALID: [b, hb-1, wb-1, 4*Cout]
    # pooled (u,v) lives at block-conv output (u+1, v+1)
    y = jax.lax.slice(y, (0, 1, 1, 0), (b, 1 + ho, 1 + wo, 4 * c_out))
    if "b" in params:
        y = y + jnp.tile(params["b"], 4).astype(y.dtype)
    new_params = None
    if "bn" in params:
        bn = params["bn"]
        if train:
            # same stats as full-res batch_norm_train: the phase axis
            # enumerates each conv output exactly once
            y32 = y.astype(jnp.float32)
            y5 = y32.reshape(b, ho, wo, 4, c_out)
            mean = jnp.mean(y5, axis=(0, 1, 2, 3))
            var = jnp.var(y5, axis=(0, 1, 2, 3))
            n = b * ho * wo * 4
            unbiased_var = var * (n / max(n - 1, 1))
            inv = jax.lax.rsqrt(var + _BN_EPS)
            g4, b4 = jnp.tile(bn["gamma"], 4), jnp.tile(bn["beta"], 4)
            m4 = jnp.tile(mean, 4)
            y = ((y32 - m4) * jnp.tile(inv, 4) * g4 + b4).astype(y.dtype)
            momentum = 0.1
            new_params = dict(params, bn=dict(
                bn,
                mean=(1 - momentum) * bn["mean"] + momentum * mean,
                var=(1 - momentum) * bn["var"] + momentum * unbiased_var))
        else:
            inv = jax.lax.rsqrt(bn["var"].astype(jnp.float32) + _BN_EPS)
            scale = jnp.tile(bn["gamma"] * inv, 4).astype(y.dtype)
            offset = jnp.tile(
                bn["beta"] - bn["gamma"] * bn["mean"] * inv, 4
            ).astype(y.dtype)
            y = y * scale + offset
    if _QUANT_TAP is not None and hasattr(_QUANT_TAP, "pre"):
        _QUANT_TAP.pre(y)
    if slope is None:
        y = jnp.maximum(y, 0.0)
    else:
        y = leaky_relu(y, slope)
    if _QUANT_TAP is not None:
        y = _QUANT_TAP(y)
    # the 2x2 pool = max over the four phase groups (activation and
    # fake-quant taps are monotone and per-channel, so applying them on
    # phases then maxing equals pooling after them)
    out = jnp.max(y.reshape(b, ho, wo, 4, c_out), axis=3)
    if train:
        return out, (new_params if new_params is not None else params)
    return out


# Trace-time switch for the s2d pooled-conv form. 0 = off (exact
# reference float semantics). When set to a channel threshold, every
# conv_block_pool whose C_in <= threshold traces the s2d form instead.
_FAST_POOL_CIN_MAX = 0


class fast_pool_context:
    """``with fast_pool_context(cin_max=32): jit-trace the model`` —
    conv+pool pairs with C_in <= cin_max compute at pooled resolution via
    space-to-depth (conv_block_pool_s2d). Mathematically the same op with
    a different float summation order; the entry convs (C_in 3..32) are
    the ones that otherwise run VPU-bound. Trace-time only, like
    quantization_context: the flag is read while the forward traces."""

    def __init__(self, cin_max: int = 32):
        self.cin_max = cin_max

    def __enter__(self):
        global _FAST_POOL_CIN_MAX
        self._prev = _FAST_POOL_CIN_MAX
        _FAST_POOL_CIN_MAX = self.cin_max
        return self

    def __exit__(self, *exc):
        global _FAST_POOL_CIN_MAX
        _FAST_POOL_CIN_MAX = self._prev
        return False


def conv_block_pool(params, x, slope: float = MODEL_LEAKY_SLOPE,
                    train: bool = False):
    """conv_block(3x3, s1, p1) followed by a 2x2/2 max pool.

    Default trace = exactly conv_block(...) + max_pool(2,2) (bit-identical
    with the reference float semantics). Inside a fast_pool_context, entry
    layers trace the pooled-resolution s2d form instead.
    """
    c_in = params["w"].shape[2]
    if (0 < c_in <= _FAST_POOL_CIN_MAX
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
        return conv_block_pool_s2d(params, x, slope=slope, train=train)
    if train:
        y, new_params = conv_block(params, x, padding=1, slope=slope,
                                   train=True)
        return max_pool(y, 2, 2), new_params
    return max_pool(conv_block(params, x, padding=1, slope=slope), 2, 2)


def residual_add(y, x):
    """Residual addition with a quantization tap on the sum.

    In float training/inference this is just ``y + x``. Under a
    quantization context the sum gets its own tracker: an integer
    datapath must re-quantize the sum of two differently-scaled int8
    tensors to a single scale before the next conv consumes it, so the
    sum's range must be calibrated. (The reference never quantizes a
    residual network; this extends its scheme to darknet53.)
    """
    s = y + x
    if _QUANT_TAP is not None:
        s = _QUANT_TAP(s)
    return s


def pred_conv(params, x, padding: int = 0):
    """Prediction-head conv (biased, no activation) with the quantization
    tap applied when a context is active (the reference's a_tracker_pred,
    models/slim_yolo_v2.py:89,328)."""
    y = conv2d(x, params["w"], params["b"], padding=padding)
    if _QUANT_TAP is not None and hasattr(_QUANT_TAP, "pre"):
        _QUANT_TAP.pre(y)
    if _QUANT_TAP is not None:
        y = _QUANT_TAP(y)
    return y


def max_pool(x, window: int = 2, stride: int = 2, padding: int = 0):
    """Max pool, NHWC. Matches torch MaxPool2d (floor mode, -inf pad)."""
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
        else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def reorg(x, stride: int = 2):
    """Space-to-depth passthrough layer.

    Matches the exact channel ordering of the reference implementation
    (utils/modules.py:43-57): output channel blocks are ordered by the
    (row, col) position inside each stride x stride window, with the
    original channels contiguous inside each block — i.e. NCHW
    ``[B, s*s, C, H/s, W/s]`` flattened, which in NHWC is a transpose of
    jnp's native space_to_depth ordering.
    """
    b, h, w, c = x.shape
    s = stride
    x = x.reshape(b, h // s, s, w // s, s, c)
    # -> [B, H/s, W/s, s(row), s(col), C] -> channels = (row, col, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // s, w // s, s * s * c)


def spp(x):
    """Spatial pyramid pooling: concat [x, mp5(x), mp9(x), mp13(x)] on C
    (reference utils/modules.py:59-72)."""
    x1 = max_pool(x, 5, 1, 2)
    x2 = max_pool(x, 9, 1, 4)
    x3 = max_pool(x, 13, 1, 6)
    return jnp.concatenate([x, x1, x2, x3], axis=-1)


def upsample2x(x):
    """2x bilinear upsample, half-pixel centers (align_corners=False)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


def _align_corners_weights(n_in: int, n_out: int):
    """Interpolation (lo index, hi index, frac) for align_corners=True."""
    if n_in == 1:
        src = np.zeros(n_out)
    else:
        src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    lo = np.floor(src).astype(np.int32)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (src - lo).astype(np.float32)
    return lo, hi, frac


def _upsample2x_matrix(n: int) -> np.ndarray:
    """[2n, n] align-corners interpolation matrix (two nonzeros/row)."""
    lo, hi, frac = _align_corners_weights(n, 2 * n)
    u = np.zeros((2 * n, n), np.float32)
    u[np.arange(2 * n), lo] += 1.0 - frac
    u[np.arange(2 * n), hi] += frac
    return u


def upsample2x_align_corners(x):
    """2x bilinear upsample with align_corners=True, matching the
    reference FPN upsamples (F.interpolate(..., align_corners=True),
    models/yolo_v3.py:211-215, models/tiny_yolo_v3.py:188).

    Implemented as two dense matmuls with trace-time-constant [2n, n]
    interpolation matrices (two nonzeros per row): on TPU a small MXU
    matmul beats the gather lowering by ~8 ms/batch in the int8 v3
    serving graph (measured @26²→52², b64). Bit-exact with the
    gather-lerp form — the extra matmul terms are exact float zeros,
    and the two nonzero products/sums are the same arithmetic.
    """
    b, h, w, c = x.shape
    u_h = jnp.asarray(_upsample2x_matrix(h), x.dtype)
    u_w = jnp.asarray(_upsample2x_matrix(w), x.dtype)
    x = jnp.einsum("Hh,bhwc->bHwc", u_h, x)
    x = jnp.einsum("Ww,bhwc->bhWc", u_w, x)
    return x


def zero_pad_maxpool_s1(x):
    """ZeroPad2d((0,1,0,1)) + MaxPool2d(2, stride=1) — the tiny-yolov3
    backbone's last pool (reference backbone/darknet.py:232-235).

    Note: zero padding (not -inf) exactly as the reference does it.
    """
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return max_pool(x, 2, 1, 0)


def flatten_grid(pred: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H*W, C] (the reference's permute+view,
    models/slim_yolo_v2.py:333)."""
    b, h, w, c = pred.shape
    return pred.reshape(b, h * w, c)


def count_params(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params)))
