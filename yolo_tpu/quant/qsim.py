"""Quantized float-simulation forward of slim_yolo_v2 (the PTQ model).

This is the TPU equivalent of the reference's
``SlimYOLOv2_quantize_bnfuse`` forward with its ``quantization``/``find``
flags (models/slim_yolo_v2.py:212-328): BN-fused convs with fake-quant
weights, an activation range tracker around every layer (input,
post-conv1..7, post-pred — 11 trackers, matching the C engine's
``scale_a[11]`` table, c_embedding/yolo_forward.c:34), and per-layer
conv-output maxima for the int16-accumulator overflow search.

Everything is functional: tracker EMA state is carried explicitly, and
"find mode" records per-layer maxima instead of crashing on an assert
(models/slim_yolo_v2.py:222-227) — the search becomes a direct headroom
computation.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from yolo_tpu.models.slim_yolo_v2 import CONV_LAYERS
from yolo_tpu.ops import blocks
from yolo_tpu.quant import quantize as q

# Tracker order: input, after each conv, after pred. 11 entries.
TRACKER_NAMES = ("in",) + tuple(n for n, _, _, _ in CONV_LAYERS) + ("pred",)
# Layer order of the 10 quantized convs (9 backbone + pred).
QUANT_LAYER_NAMES = tuple(n for n, _, _, _ in CONV_LAYERS) + ("pred",)


def init_tracker_states() -> Dict[str, dict]:
    return {name: q.tracker_init() for name in TRACKER_NAMES}


def fake_quantize_params(params, bitwidth: int = 8,
                         weight_bitwidth: int = None,
                         per_channel: bool = False):
    """Fake-quantize every conv weight+bias with pow2 per-tensor scales
    (reference quantize_layers, retune_bias_quantize.py:111-119).
    Params must be the BN-fused form ({'w','b'} per layer).

    ``weight_bitwidth``: quantize WEIGHTS at a narrower width (e.g. 4)
    while bias stays at ``bitwidth`` — the sub-8-bit compression axis
    (scripts/quant_bitwidth.py); the integer engine is unchanged (b-bit
    levels are a subset of int8 and the shift chain only sees sw).

    ``per_channel``: per-output-channel weight scales (TPU-serving
    opt-in; see fixed_point.quantize_model)."""
    wb = weight_bitwidth or bitwidth
    w_axis = -1 if per_channel else None
    out = {}
    for name in QUANT_LAYER_NAMES:
        layer = params[name]
        out[name] = {
            "w": q.fake_quantize(layer["w"], wb, channel_axis=w_axis),
            "b": q.fake_quantize(layer["b"], bitwidth),
        }
    return out


def weight_scale_exponents(params, bitwidth: int = 8):
    """Per-layer (sw, sb) log2 scale exponents — the C engine's
    scale_w/scale_b tables (c_embedding/yolo_forward.c:32-33)."""
    sw, sb = {}, {}
    for name in QUANT_LAYER_NAMES:
        sw[name] = int(jnp.log2(q.pow2_scale(params[name]["w"], bitwidth)))
        sb[name] = int(jnp.log2(q.pow2_scale(params[name]["b"], bitwidth)))
    return sw, sb


def quant_forward(params, x, cfg, tracker_states, *,
                  quantization: bool = True, update: bool = False,
                  bitwidth: int = 8, head_clip: float = None,
                  act_percentile: float = None):
    """Fake-quant forward.

    Args:
      params: BN-fused (and typically already fake-quantized) param pytree.
      tracker_states: dict name -> tracker state.
      quantization: False -> plain float forward (trackers pass through).
      update: True during calibration (EMA advances).

    Returns (outputs, new_states, conv_maxima) where outputs is the
    1-element head list (model API), and conv_maxima maps layer name ->
    max |conv output + bias| over this batch (for the retune search).

    NOTE: maxima are recorded PRE-activation — that is where the FPGA's
    int16 accumulator lives. (The reference asserts on the post-LeakyReLU
    value, models/slim_yolo_v2.py:222-227, which can only under-estimate
    since leaky shrinks negatives; pre-activation is the conservative,
    hardware-true choice.)
    """
    new_states = dict(tracker_states)
    maxima = {}

    def track(name, act):
        if not quantization:
            return act
        # head_clip caps the prediction head's tracked range — the conf
        # logits dominate |max| but saturate through sigmoid anyway, so
        # capping preserves boxes/classes at much finer resolution.
        cap = head_clip if name == "pred" else None
        # the input tap keeps abs-max semantics: image data has no
        # outlier tail worth trading resolution for
        sq = act_percentile if name != "in" else None
        val, st = q.tracker_quantize(tracker_states[name], act, bitwidth,
                                     update=update, max_cap=cap,
                                     stat_q=sq)
        new_states[name] = st
        return val

    out = track("in", x)
    for name, _, _, pool in CONV_LAYERS:
        out = blocks.conv2d(out, params[name]["w"], params[name]["b"],
                            padding=1)
        maxima[name] = jnp.max(jnp.abs(out))
        out = blocks.leaky_relu(out)
        out = track(name, out)
        if pool:
            out = blocks.max_pool(out, 2, 2)
    pred = blocks.conv2d(out, params["pred"]["w"], params["pred"]["b"],
                         padding=1)
    maxima["pred"] = jnp.max(jnp.abs(pred))
    pred = track("pred", pred)
    return [pred], new_states, maxima


def make_quant_module(params_q, tracker_states):
    """Adapter exposing the frozen quantized model through the uniform
    model-module API (STRIDES/forward), so the Detector facade and
    evaluators run it unchanged."""

    class _QuantModule:
        STRIDES = (16,)

        @staticmethod
        def forward(params, x, cfg, train=False):
            assert not train, "quantized sim is inference-only"
            outs, _, _ = quant_forward(params, x, cfg, tracker_states,
                                       quantization=True, update=False)
            return outs

        @staticmethod
        def init_params(rng, cfg, batch_norm=False, dtype=None):
            raise NotImplementedError("load params via the quant pipeline")

    return _QuantModule


# ---------------------------------------------------------------------------
# Calibration + retune search drivers.
# ---------------------------------------------------------------------------


def calibrate(params_q, cfg, batches, max_images: int = 1000,
              head_clip: float = None, act_percentile: float = None):
    """PTQ max-calibration: fold tracker EMA over ~max_images images
    (reference retune_bias_quantize.py:324-369). ``batches`` yields
    [B, H, W, 3] arrays. Returns final tracker states.

    ``act_percentile``: track the q-th percentile of |act| instead of
    the max on every non-input tracker (per-tracker outlier clip;
    quant/autoclip.py searches the best value)."""
    states = init_tracker_states()

    @jax.jit
    def step(states, x):
        _, new_states, _ = quant_forward(params_q, x, cfg, states,
                                         quantization=True, update=True,
                                         head_clip=head_clip,
                                         act_percentile=act_percentile)
        return new_states

    seen = 0
    for x in batches:
        states = step(states, x)
        seen += x.shape[0]
        if seen > max_images:
            break
    return jax.device_get(states)


def find_retune_exponents(params_q, cfg, tracker_states, batches,
                          acc_bits: int = 16, margin: float = 1.0
                          ) -> Dict[str, int]:
    """Accumulator-overflow shift search.

    The FPGA accumulates each conv at value ~ real * 2^retune in an int16
    (c_embedding/yolo_forward.c:233-257); the reference finds the largest
    safe retune per layer by crash-testing candidate tables
    (retune_bias_quantize_findbest.py:115-148 + the find-mode asserts).
    Here the headroom is computed directly: retune = largest r with
    max|conv_out| * 2^r * margin < 2^(acc_bits-1).
    """
    states = tracker_states

    @jax.jit
    def step(x):
        _, _, maxima = quant_forward(params_q, x, cfg, states,
                                     quantization=True, update=False)
        return maxima

    agg = {name: 0.0 for name in QUANT_LAYER_NAMES}
    for x in batches:
        m = jax.device_get(step(x))
        for name in agg:
            agg[name] = max(agg[name], float(m[name]))

    import math
    limit = 2.0 ** (acc_bits - 1)
    cap = acc_bits - 2  # degenerate all-zero layers get a safe default
    return {
        name: (cap if mx <= 0 else min(
            cap, int(math.floor(math.log2(limit / (mx * margin))))))
        for name, mx in agg.items()
    }


def activation_scale_exponents(tracker_states) -> Dict[str, int]:
    """log2 of each tracker's pow2 scale — the C scale_a table."""
    return {name: q.tracker_sa_np(st)
            for name, st in tracker_states.items()}
