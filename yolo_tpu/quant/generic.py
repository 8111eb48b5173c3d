"""Model-agnostic post-training quantization (all five architectures).

The reference only quantizes slim_yolo_v2, by hand-inserting tracker
modules into a dedicated class (models/slim_yolo_v2.py:40-89). Here the
instrumentation is generic: a trace-time quantization context taps every
conv block / prediction head in call order (ops/blocks.py), so the same
pow2 fake-quant semantics — weight/bias per-tensor pow2 scales +
EMA-tracked activation scales — apply to ANY model module, including the
v3 FPN family (the BASELINE.json tiny_yolo_v3 / yolo_v3(-spp) INT8
configs).

Note on "INT8": this is the float fake-quant simulation — exactly what
the reference's quantized Python model computes (its true-integer path
exists only in the C engine). The bit-true integer engine
(quant/fixed_point.py) remains specific to the FPGA deployment net.
"""

from __future__ import annotations

from functools import partial
from typing import Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.ops import blocks
from yolo_tpu.quant import quantize as q


def _fake_quantize_tree(params, bitwidth: int, weight_bitwidth: int = None,
                        per_channel: bool = False):
    wb = weight_bitwidth or bitwidth
    w_axis = -1 if per_channel else None
    if isinstance(params, dict):
        if "w" in params:
            out = dict(params)
            out["w"] = q.fake_quantize(params["w"], wb, w_axis)
            if "b" in params:
                out["b"] = q.fake_quantize(params["b"], bitwidth)
            return out
        return {k: _fake_quantize_tree(v, bitwidth, weight_bitwidth,
                                       per_channel)
                for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        return type(params)(
            _fake_quantize_tree(v, bitwidth, weight_bitwidth, per_channel)
            for v in params)
    return params


@partial(jax.jit, static_argnums=(1, 2, 3))
def fake_quantize_all_convs(params, bitwidth: int = 8,
                            weight_bitwidth: int = None,
                            per_channel: bool = False):
    """Fake-quantize every conv weight/bias in an arbitrary pytree.
    Weights at ``weight_bitwidth or bitwidth`` with per-tensor (or
    per-output-channel, HWIO axis -1) pow2 scales; biases at
    ``bitwidth`` per-tensor — fixed_point.quantize_model's exact grid.
    BN params are left alone — fold first for reference-parity
    quantization of BN models. One jitted program for the whole tree
    (per-leaf eager dispatch over the TPU tunnel costs ~50 s for
    darknet-53)."""
    return _fake_quantize_tree(params, bitwidth, weight_bitwidth,
                               per_channel)


class _Tap:
    """Call-ordered activation tracker tap used during tracing.

    ``caps`` maps tap index -> max_cap (see quantize.tracker_update);
    used to clip the prediction heads' tracked range."""

    def __init__(self, states: List[dict], update: bool, bitwidth: int,
                 caps=None, stat_q: float = None):
        self.states = states
        self.update = update
        self.bitwidth = bitwidth
        self.caps = caps or {}
        self.stat_q = stat_q
        self.idx = 0
        self.new_states: List[dict] = []
        self.pre_maxima: List = []  # per-call pre-activation |max|

    def pre(self, act):
        self.pre_maxima.append(jnp.max(jnp.abs(act)))

    def __call__(self, act):
        state = (self.states[self.idx] if self.idx < len(self.states)
                 else q.tracker_init())
        val, new = q.tracker_quantize(state, act, self.bitwidth,
                                      update=self.update,
                                      max_cap=self.caps.get(self.idx),
                                      stat_q=self.stat_q)
        self.new_states.append(new)
        self.idx += 1
        return val


def quant_forward_generic(module, params_q, x, cfg, states: List[dict],
                          update: bool = False, bitwidth: int = 8,
                          caps=None, stat_q: float = None):
    """Quantized (fake-quant) forward of any model module.

    ``states`` is the call-ordered list of tracker states (index 0 is the
    model input tap; the rest follow conv call order). Returns
    (outputs, new_states, pre_maxima) — pre_maxima is the per-conv-call
    pre-activation |max| list (accumulator headroom for the retune
    search). ``stat_q``: percentile tracking on the conv taps (the input
    tap keeps abs-max: image data has no outlier tail)."""
    tap = _Tap(states[1:] if states else [], update, bitwidth, caps,
               stat_q)
    in_state = states[0] if states else q.tracker_init()
    x, new_in = q.tracker_quantize(in_state, x, bitwidth, update=update)
    with blocks.quantization_context(tap):
        outs = module.forward(params_q, x, cfg)
    return outs, [new_in] + tap.new_states, tap.pre_maxima


def calibrate_generic(module, params_q, cfg, batches: Iterable,
                      max_images: int = 1000, bitwidth: int = 8,
                      head_clip: float = None,
                      act_percentile: float = None):
    """EMA max-calibration over ~max_images images; returns final tracker
    state list (reference retune_bias_quantize.py:324-369 semantics).

    ``head_clip`` caps the tracked range of the prediction-head taps (the
    last len(STRIDES) conv calls in every model family).
    ``act_percentile``: per-tracker outlier clip — track the q-th
    percentile of |act| instead of the max on every conv tap."""
    # bootstrap: an abstract (eval_shape — zero compute, zero compile)
    # pass only to discover the number of taps; the EMA itself starts
    # fresh so the first real batch initializes it (matching the
    # reference's first_a semantics). An eager probe here used to cost
    # ~8 min for darknet-53 over the TPU tunnel (per-op dispatch).
    first = next(iter(batches)) if not isinstance(batches, list) \
        else batches[0]
    probe = jax.eval_shape(
        lambda x: quant_forward_generic(module, params_q, x, cfg, [],
                                        update=True, bitwidth=bitwidth)[1],
        jax.ShapeDtypeStruct((1,) + tuple(first.shape[1:]), jnp.float32))
    states = [q.tracker_init() for _ in probe]
    caps = None
    if head_clip is not None:
        n_taps = len(probe) - 1  # taps excluding the input tracker
        caps = {n_taps - 1 - k: head_clip
                for k in range(len(module.STRIDES))}

    @jax.jit
    def step(states, x):
        _, new_states, _ = quant_forward_generic(
            module, params_q, x, cfg, states, update=True,
            bitwidth=bitwidth, caps=caps, stat_q=act_percentile)
        return new_states

    seen = 0
    for x in batches:
        states = step(states, jnp.asarray(x))
        seen += x.shape[0]
        if seen > max_images:
            break
    return jax.device_get(states)


def quantize_detector(det, params, calib_batches, fold_bn: bool = True,
                      max_images: int = 1000, bitwidth: int = 8,
                      head_clip: float = None, states=None,
                      weight_bitwidth: int = None,
                      per_channel: bool = False):
    """Full generic PTQ: (fold BN ->) fake-quant weights -> calibrate.

    Pass ``states`` (a call-ordered tracker-state list) to SKIP
    calibration and serve with those frozen scales — e.g. the exact
    states a QAT fine-tune trained against (re-calibrating on the tuned
    weights could move a pow2 exponent and break the trained grid).

    ``weight_bitwidth`` / ``per_channel``: sub-8-bit and/or per-output-
    channel weight grids (fake_quantize_all_convs semantics) — must
    match the grid the integer engine will serve.

    Returns (params_q, tracker_states, detect_fn) where detect_fn is the
    jitted quantized batched detector with the same signature as
    Detector.detect's body."""
    from yolo_tpu import detector as D
    from yolo_tpu.ops import decode, nms
    from yolo_tpu.quant.bn_fold import fold_batch_norm

    fused = fold_batch_norm(params) if fold_bn else params
    params_q = fake_quantize_all_convs(fused, bitwidth, weight_bitwidth,
                                       per_channel)
    if states is None:
        states = calibrate_generic(det.module, params_q, det.cfg,
                                   list(calib_batches), max_images,
                                   bitwidth, head_clip=head_clip)
    cfg = det.cfg

    class _QModule:
        STRIDES = det.module.STRIDES

        @staticmethod
        def forward(p, x, cfg, train=False):
            assert not train
            outs, _, _ = quant_forward_generic(det.module, p, x, cfg, states)
            return outs

    @jax.jit
    def detect_fn(images):
        boxes, probs = D.predict(_QModule, params_q, images, cfg)
        return nms.batched_postprocess(
            boxes, probs, cfg.conf_thresh, cfg.nms_thresh,
            cfg.pre_nms_top_k, cfg.top_k)

    return params_q, states, detect_fn
