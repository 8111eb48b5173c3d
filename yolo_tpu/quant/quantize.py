"""Power-of-two-scale quantization primitives + activation range trackers.

Semantics parity with the reference:
- weight/bias quantization (retune_bias_quantize.py:73-97): per-tensor
  scale = (2^(b-1)-1)/max|t| floored to a power of two,
  q = round(scale * t), fake-quant value q/scale.
- activation tracker (models/slim_yolo_v2.py:9-38 AveragedRangeTracker):
  EMA (momentum 0.1) of the raw scale across calibration batches, first
  batch initializes, frozen in eval; the *pow2-floored* EMA scale is what
  quantizes.

Trackers are explicit state pytrees ({'scale', 'initialized'}), not
module buffers — calibration is a pure fold over batches.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def pow2_scale(t: jnp.ndarray, bitwidth: int = 8,
               channel_axis: int = None) -> jnp.ndarray:
    """Power-of-two-floored quantization scale for a tensor.

    All-zero tensors (e.g. the zero bias an identity BN folds to) get
    scale 1.0 instead of inf — q stays 0 either way.

    ``channel_axis``: per-channel scales — the max reduces over every
    OTHER axis (keepdims, so the scale broadcasts back onto ``t``).
    Per-tensor (None) is the reference deployment contract
    (retune_bias_quantize.py:73-86); per-channel is the TPU-serving
    opt-in where the requant shift is a free [1,1,1,C] epilogue op."""
    if channel_axis is None:
        max_abs = jnp.max(jnp.abs(t))
    else:
        red = tuple(i for i in range(t.ndim)
                    if i != channel_axis % t.ndim)
        max_abs = jnp.max(jnp.abs(t), axis=red, keepdims=True)
    scale = (2.0 ** (bitwidth - 1) - 1) / jnp.where(max_abs > 0, max_abs, 1)
    return jnp.where(max_abs > 0,
                     2.0 ** jnp.floor(jnp.log2(scale)), 1.0)


def quantize_pow2(t: jnp.ndarray, bitwidth: int = 8,
                  channel_axis: int = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(integer levels, pow2 scale). q = round(scale * t)."""
    scale = pow2_scale(t, bitwidth, channel_axis)
    return jnp.round(scale * t), scale


def fake_quantize(t: jnp.ndarray, bitwidth: int = 8,
                  channel_axis: int = None) -> jnp.ndarray:
    """round(scale*t)/scale with a pow2 scale (straight-through value)."""
    q, scale = quantize_pow2(t, bitwidth, channel_axis)
    return q / scale


# ---------------------------------------------------------------------------
# Activation range tracker (explicit state).
# ---------------------------------------------------------------------------

MOMENTUM = 0.1


def tracker_init():
    """Fresh tracker state."""
    return {"scale": jnp.zeros(()), "initialized": jnp.zeros(())}


def tracker_update(state, activation, bitwidth: int = 8,
                   max_cap: float = None, stat_q: float = None):
    """One EMA update from a batch of activations
    (reference models/slim_yolo_v2.py:21-31).

    ``max_cap`` bounds the tracked range: values beyond it saturate at
    the int8 rail instead of widening the grid for everyone. Lossless for
    logits that feed sigmoids (the detection head's objectness scores
    dominate the range but saturate anyway).

    ``stat_q`` (e.g. 99.9) tracks the q-th PERCENTILE of |activation|
    instead of the max: a per-tracker clip that trades saturation of the
    tail outliers for a finer grid on the bulk — the per-tensor abs-max
    grid is exactly where tiny_yolo_v3's sim loss lives (VERDICT r4
    next #4). None/100 keeps the reference's abs-max semantics.
    """
    if stat_q is not None and stat_q < 100.0:
        max_abs = jnp.percentile(jnp.abs(activation), stat_q)
    else:
        max_abs = jnp.max(jnp.abs(activation))
    if max_cap is not None:
        max_abs = jnp.minimum(max_abs, max_cap)
    new_scale = (2.0 ** (bitwidth - 1) - 1) / jnp.where(
        max_abs > 0, max_abs, 1)
    first = state["initialized"] == 0
    scale = jnp.where(
        first, new_scale,
        state["scale"] * (1 - MOMENTUM) + new_scale * MOMENTUM)
    return {"scale": scale, "initialized": jnp.ones(())}


def tracker_pow2(state) -> jnp.ndarray:
    """The pow2-floored scale actually used for quantization
    (models/slim_yolo_v2.py:33)."""
    return 2.0 ** jnp.floor(jnp.log2(state["scale"]))


def quantize_pow2_np(t, bitwidth: int = 8, channel_axis: int = None):
    """Host (numpy) twin of quantize_pow2: (levels, log2(scale) int).

    The integer-model builders run per-conv on the host after
    calibration; doing this math eagerly in jnp dispatches ~2 tiny TPU
    programs per conv over the tunnel (~30 s for darknet-53). One
    device_get of the tree + numpy is instant and bit-identical (pow2
    scales are exact in both).

    ``channel_axis``: per-channel scales — returns (levels,
    int32 exponent array [C]) instead of (levels, int). All-zero
    channels get exponent 0 (their levels are 0 either way)."""
    import numpy as np

    t = np.asarray(t, np.float32)
    if channel_axis is not None:
        ax = channel_axis % t.ndim
        red = tuple(i for i in range(t.ndim) if i != ax)
        max_abs = np.max(np.abs(t), axis=red, keepdims=True)
        # stay f32 end-to-end so exponents match the device pow2_scale
        scale = (np.float32(2.0 ** (bitwidth - 1) - 1)
                 / np.where(max_abs > 0, max_abs, np.float32(1)))
        s_exp = np.floor(np.log2(scale.astype(np.float32))).astype(
            np.int32)
        s_exp = np.where(max_abs > 0, s_exp, 0).astype(np.int32)
        levels = np.round(t * np.exp2(s_exp.astype(np.float32)))
        return levels, s_exp.reshape(-1)
    max_abs = np.max(np.abs(t)) if t.size else np.float32(0)
    if max_abs <= 0:
        return np.zeros_like(t), 0
    # stay in float32 so the exponent matches the device computation
    # exactly even at pow2 boundaries
    scale = np.float32(2.0 ** (bitwidth - 1) - 1) / max_abs
    s_exp = int(np.floor(np.log2(scale)))
    return np.round(t * np.float32(2.0 ** s_exp)), s_exp


def tracker_sa_np(state) -> int:
    """Host twin of log2(tracker_pow2(state)): the tap's scale exponent."""
    import numpy as np

    scale = np.asarray(state["scale"], np.float32)  # f32 like the device
    return int(np.floor(np.log2(scale)))


def tracker_quantize(state, activation, bitwidth: int = 8,
                     update: bool = False, rescale: bool = True,
                     max_cap: float = None, stat_q: float = None):
    """Fake-quantize an activation through the tracker.

    With update=True (calibration) the EMA advances first — matching the
    reference order where the scale update sees the current batch before
    quantizing (models/slim_yolo_v2.py:21-38). Quantized levels saturate
    at the int8 rails (what the integer datapath does; the reference's
    float sim omits the clamp and can silently exceed int8 on unseen
    data). Returns (value, new_state).
    """
    if update:
        state = tracker_update(state, activation, bitwidth, max_cap,
                               stat_q)
    scale = tracker_pow2(state)
    lim = 2.0 ** (bitwidth - 1) - 1
    q = jnp.clip(jnp.round(scale * activation), -lim - 1, lim)
    return (q / scale if rescale else q), state
