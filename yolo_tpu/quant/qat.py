"""Quantization-aware fine-tuning (QAT) under the fake-quant forward.

The reference ships the machinery for this but never closes the loop:
``quantize_activation`` computes the fake-quant value and even marks the
rounded tensor ``requires_grad = True`` (reference
models/slim_yolo_v2.py:16-38), yet the retune driver with ``-q`` only
CALIBRATES — it ``continue``s past ``total_loss.backward()`` for every
batch and stops after ~1000 images (retune_bias_quantize.py:358-369).
The published pipeline is therefore float-fine-tune -> PTQ; quantization
error is never trained against.

This module is the gradient closure of that loop, the JAX way:

- round/clip become straight-through estimators (STE): identity gradient
  inside the int8 rails, zero outside (the clip is real, so saturating
  activations stop receiving gradient — the standard clipped-STE rule).
- conv weights/biases are fake-quantized EVERY step with fresh pow2
  per-tensor scales (quantize.fake_quantize semantics), so the master
  fp32 weights learn to sit well inside their own quantization grid.
- activation taps use the FROZEN calibrated tracker scales — exactly the
  scales the integer engine will serve with — via the same trace-time
  ``blocks.quantization_context`` the generic PTQ uses, so QAT works for
  every model family with zero per-model code.
- the ordinary trainer (optax SGD, fp32 master params) runs unchanged:
  ``QATModule`` is a drop-in ``module`` for ``make_train_step``.

The fine-tuned fp32 params feed the existing integer builders
(quant/int8_graph.quantize_pipeline, quant/generic.quantize_detector)
unchanged — QAT trains the weights the engine will round.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from yolo_tpu.ops import blocks
from yolo_tpu.quant import quantize as q


def _ste(x, q_val):
    """Value ``q_val``, gradient of ``x`` (straight-through)."""
    return x + jax.lax.stop_gradient(q_val - x)


def fake_quantize_ste(t, bitwidth: int = 8, channel_axis: int = None):
    """Weight fake-quant with STE: value = round(scale*t)/scale at the
    pow2 per-tensor (or per-``channel_axis``) scale, gradient =
    identity. No clip is needed — the scale is derived from max|t| so
    every element is in range."""
    return _ste(t, q.fake_quantize(t, bitwidth, channel_axis))


def tracker_quantize_ste(state, act, bitwidth: int = 8):
    """Activation fake-quant through a FROZEN tracker with clipped STE.

    Clip first (differentiable: gradient 0 outside the rails), then
    round with STE. Values are bit-identical to quantize.tracker_quantize
    with update=False: rounding the pre-clipped value can only exceed the
    rails when the raw value already does.
    """
    scale = q.tracker_pow2(state)
    lim = 2.0 ** (bitwidth - 1) - 1
    a_c = jnp.clip(act, (-lim - 1) / scale, lim / scale)
    return _ste(a_c, jnp.round(scale * a_c) / scale)


def _fq_tree_ste(params, bitwidth: int, weight_bitwidth: int = None,
                 per_channel: bool = False):
    """STE twin of generic._fake_quantize_tree (conv {'w','b'} leaves).

    Mirrors fixed_point.quantize_model's grid exactly: weights at
    ``weight_bitwidth or bitwidth`` with per-tensor (or per-output-
    channel, axis -1 of HWIO) pow2 scales; biases always at ``bitwidth``
    per-tensor — that is the grid the integer engine serves."""
    wb = weight_bitwidth or bitwidth
    w_axis = -1 if per_channel else None
    if isinstance(params, dict):
        if "w" in params:
            out = dict(params)
            out["w"] = fake_quantize_ste(params["w"], wb, w_axis)
            if "b" in params:
                out["b"] = fake_quantize_ste(params["b"], bitwidth)
            return out
        return {k: _fq_tree_ste(v, bitwidth, weight_bitwidth, per_channel)
                for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        return type(params)(
            _fq_tree_ste(v, bitwidth, weight_bitwidth, per_channel)
            for v in params)
    return params


class _QATTap:
    """Call-ordered activation tap with frozen scales + clipped STE."""

    def __init__(self, states: Sequence[dict], bitwidth: int):
        self.states = states
        self.bitwidth = bitwidth
        self.idx = 0

    def __call__(self, act):
        if self.idx >= len(self.states):
            raise ValueError(
                f"QAT tap #{self.idx} has no calibrated tracker state "
                f"(got {len(self.states)}); calibrate with the same "
                "model/config first")
        val = tracker_quantize_ste(self.states[self.idx], act,
                                   self.bitwidth)
        self.idx += 1
        return val


class QATModule:
    """Module adapter: the base model's forward under STE fake-quant.

    ``states`` is the call-ordered tracker-state list from
    generic.calibrate_generic (index 0 = input tap). Drop-in for
    ``make_train_step(module, ...)`` / ``detector.train_outputs``.
    """

    def __init__(self, base_module, states: Sequence[dict],
                 bitwidth: int = 8, weight_bitwidth: int = None,
                 per_channel: bool = False):
        self.base = base_module
        self.STRIDES = base_module.STRIDES
        self.states = [jax.tree_util.tree_map(jnp.asarray, s)
                       for s in states]
        self.bitwidth = bitwidth
        self.weight_bitwidth = weight_bitwidth
        self.per_channel = per_channel

    def init_params(self, rng, cfg, batch_norm=False, dtype=None):
        return self.base.init_params(rng, cfg, batch_norm=batch_norm,
                                     dtype=dtype)

    def forward(self, params, x, cfg, train: bool = False):
        params_q = _fq_tree_ste(params, self.bitwidth,
                                self.weight_bitwidth, self.per_channel)
        x = tracker_quantize_ste(self.states[0], x, self.bitwidth)
        tap = _QATTap(self.states[1:], self.bitwidth)
        with blocks.quantization_context(tap):
            out = self.base.forward(params_q, x, cfg, train=train)
        if not train:
            return out
        # The base forward's new_params tree carries the FAKE-QUANTIZED
        # weight leaves; the optimizer must update the fp32 masters
        # (same trap as bf16 mixed precision — trainer._graft_bn_stats).
        from yolo_tpu.train.trainer import _graft_bn_stats
        outs, new_q = out
        return outs, _graft_bn_stats(params, new_q)


def states_from_qsim(tracker_states: dict) -> List[dict]:
    """Convert the slim-specific qsim tracker dict (name -> state) to the
    call-ordered list the generic tap consumes."""
    from yolo_tpu.quant.qsim import TRACKER_NAMES

    return [tracker_states[n] for n in TRACKER_NAMES]


def _assert_bn_free(params, where: str):
    """QAT must run on a BN-FOLDED tree: fake-quantizing raw conv weights
    that a following BN rescales would train against a quantization grid
    the deployed (folded) model never uses. Fail loudly instead."""
    bad = []

    def walk(p, path):
        if isinstance(p, dict):
            if "bn" in p:
                bad.append(path or "<root>")
            for k, v in p.items():
                walk(v, f"{path}/{k}" if path else k)
        elif isinstance(p, (list, tuple)):
            for i, v in enumerate(p):
                walk(v, f"{path}[{i}]")

    walk(params, "")
    if bad:
        raise ValueError(
            f"{where} requires a BN-folded param tree (batch_norm=False);"
            f" found 'bn' entries at: {bad[:5]}"
            f"{' ...' if len(bad) > 5 else ''}. Run quant.bn_fold."
            "fold_batch_norm (CLI: quantize bnfold) first.")


def qat_finetune(det, params_fused, states: Sequence[dict],
                 batches_with_targets, base_lr: float = 1e-5,
                 steps: int = 100, bitwidth: int = 8, mesh=None,
                 weight_bitwidth: int = None, per_channel: bool = False):
    """Fine-tune BN-fused fp32 params under the fake-quant forward.

    Args:
      det: Detector (batch_norm=False).
      params_fused: BN-fused param pytree (fp32 masters).
      states: call-ordered calibrated tracker states
        (generic.calibrate_generic output, or states_from_qsim(...)).
      batches_with_targets: yields (images [B,H,W,3], gt_tensor).
      weight_bitwidth / per_channel: train against the exact sub-8-bit
        and/or per-output-channel weight grid the engine will serve
        (fixed_point.quantize_model semantics); activations/bias stay
        at ``bitwidth``.

    Returns (params, last_metrics) — same contract as retune_finetune;
    re-quantize the result through the usual PTQ builders (passing the
    SAME weight_bitwidth/per_channel/states).
    """
    from yolo_tpu.train.trainer import TrainConfig, make_train_step

    _assert_bn_free(params_fused, "qat_finetune")
    qmod = QATModule(det.module, states, bitwidth,
                     weight_bitwidth=weight_bitwidth,
                     per_channel=per_channel)
    tc = TrainConfig(base_lr=base_lr, wp_epoch=0)
    opt, step = make_train_step(qmod, det.cfg, tc, mesh=mesh,
                                donate=False)
    opt_state = opt.init(params_fused)
    params = params_fused
    last = None
    for i, (images, gt) in enumerate(batches_with_targets):
        if i >= steps:
            break
        params, opt_state, last = step(params, opt_state, images, gt,
                                       base_lr)
    return params, last
