"""True-integer INT8 graphs for the FPN model family.

Extends the FPGA fixed-point execution model (quant/fixed_point.py)
beyond the slim deployment net: tiny_yolo_v3 runs end-to-end in int8 —
int8 convs with int16-saturating accumulators and shift requantization,
int8 max pools, the darknet_light zero-pad stride-1 pool, an exact
split-conv over the FPN channel concat (each branch keeps its own scale),
and a fixed-point 2x upsample. This covers the BASELINE.json
"tiny_yolo_v3 INT8 — two-scale FPN head decode + multi-anchor NMS"
config with real integer arithmetic (the reference only ever ran integer
math for slim, in its C engine).

Calibration comes from the generic quantization context
(quant/generic.py): tracker scales in conv call order plus per-conv
pre-activation maxima for the retune (accumulator headroom) search.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.config import DetectorConfig
from yolo_tpu.quant import fixed_point as fp
from yolo_tpu.quant import quantize as q

# conv call order of tiny_yolo_v3.forward (models/tiny_yolo_v3.py:41-59;
# darknet_light backbone then head). Index aligns with the generic
# context's tap order.
TINY_CONV_ORDER = (
    "conv_1", "conv_2", "conv_3", "conv_4", "conv_5", "conv_6", "conv_7",
    "conv_set_2", "conv_1x1_2", "conv_set_1", "extra_conv_2",
    "pred_2", "pred_1",
)
# which tap each conv reads as input ('in' = the input tracker);
# conv_set_1 reads the concat [C4 (conv_5 tap), upsampled conv_1x1_2].
TINY_INPUT_TAP = {
    "conv_1": "in", "conv_2": "conv_1", "conv_3": "conv_2",
    "conv_4": "conv_3", "conv_5": "conv_4", "conv_6": "conv_5",
    "conv_7": "conv_6", "conv_set_2": "conv_7",
    "conv_1x1_2": "conv_set_2",
    "conv_set_1": ("conv_5", "conv_1x1_2"),
    "extra_conv_2": "conv_set_2", "pred_2": "extra_conv_2",
    "pred_1": "conv_set_1",
}
_TINY_SPATIAL = {  # (padding, followed by ops)
    "conv_1": 1, "conv_2": 1, "conv_3": 1, "conv_4": 1, "conv_5": 1,
    "conv_6": 1, "conv_7": 1, "conv_set_2": 1, "conv_1x1_2": 0,
    "conv_set_1": 1, "extra_conv_2": 1, "pred_2": 0, "pred_1": 0,
}


@dataclass
class Int8Tiny:
    w_q: Dict[str, jnp.ndarray]
    b_q: Dict[str, jnp.ndarray]
    sw: Dict[str, int]
    sb: Dict[str, int]
    sa: Dict[str, int]          # 'in' + each conv name -> exponent
    retune: Dict[str, int]


def _flat_tiny_params(fused) -> Dict[str, dict]:
    """Name -> {'w','b'} for the 13 convs of the BN-fused tiny model."""
    bb = fused["backbone"]
    flat = {name: bb[name][0] for name in
            ("conv_1", "conv_2", "conv_3", "conv_4", "conv_5", "conv_6",
             "conv_7")}
    for name in ("conv_set_2", "conv_1x1_2", "conv_set_1", "extra_conv_2",
                 "pred_2", "pred_1"):
        flat[name] = fused[name]
    return flat


def quantize_tiny_yolo_v3(fused, tracker_states: List[dict],
                          pre_maxima: List[float],
                          acc_bits: int = 16,
                          weight_bitwidth: int = None,
                          per_channel: bool = False) -> Int8Tiny:
    """BN-fused tiny params + generic calibration -> integer model.

    tracker_states: call-ordered list from generic.calibrate_generic
    (index 0 = input). pre_maxima: per-conv max |pre-activation| from the
    calibration data (same order as TINY_CONV_ORDER).
    weight_bitwidth/per_channel: fixed_point.quantize_model's weight
    grid (sub-8-bit levels stay int8-compatible; per-channel sw is an
    int32 [C_out] array served as a per-channel epilogue shift).
    """
    flat = jax.device_get(_flat_tiny_params(fused))  # one transfer
    wb = weight_bitwidth or 8
    w_axis = -1 if per_channel else None
    w_q, b_q, sw, sb, sa, retune = {}, {}, {}, {}, {}, {}
    sa["in"] = q.tracker_sa_np(tracker_states[0])
    limit = 2.0 ** (acc_bits - 1)
    for i, name in enumerate(TINY_CONV_ORDER):
        layer = flat[name]
        wq, sw[name] = q.quantize_pow2_np(layer["w"], wb,
                                          channel_axis=w_axis)
        bq, sb[name] = q.quantize_pow2_np(layer["b"])
        w_q[name] = np.clip(wq, fp.INT8_MIN, fp.INT8_MAX).astype(np.int8)
        b_q[name] = np.clip(bq, fp.INT8_MIN, fp.INT8_MAX).astype(np.int32)
        sa[name] = q.tracker_sa_np(tracker_states[i + 1])
        mx = float(pre_maxima[i])
        retune[name] = (acc_bits - 2 if mx <= 0 else
                        min(acc_bits - 2,
                            int(math.floor(math.log2(limit / mx)))))
    return Int8Tiny(w_q, b_q, sw, sb, sa, retune)


def int8_tiny_forward(m: Int8Tiny, x_q: jnp.ndarray,
                      rounding: str = "nearest",
                      input_s2d: bool = False):
    """int8 input -> [pred_1, pred_2] float heads (s16, s32 order,
    matching models/tiny_yolo_v3.forward).

    ``input_s2d``: ``x_q`` is the padded space-to-depth serving layout
    (fp.s2d_input / native layout='s2d'); conv_1 + its maxpool execute
    as ONE fused MXU block conv at pooled resolution (bit-exact —
    fp.int8_conv_pool_s2d_core), the same entry form the slim engine
    uses (docs/PERFORMANCE.md round 3)."""

    def conv(name, x, leaky=True, sa_in=None):
        return fp.int_conv_requant(
            x, m.w_q[name], m.b_q[name], sw=m.sw[name], sb=m.sb[name],
            sa_in=sa_in, sa_out=m.sa[name], retune=m.retune[name],
            padding=_TINY_SPATIAL[name], leaky=leaky, rounding=rounding)

    # darknet_light backbone runs LeakyReLU(0.1) (models/darknet.SLOPE);
    # the head blocks run 0.125. The integer engine honors both slopes
    # (fp._leaky_int_slope) — running the whole net at the 0.125 shift
    # measured a ~2-mAP integer-vs-sim gap on the 512-image val split.
    BB = 0.1
    if input_s2d:
        out = fp.int8_conv_pool_s2d_core(
            x_q, m.w_q["conv_1"], m.b_q["conv_1"], c_in=3,
            sw=m.sw["conv_1"], sb=m.sb["conv_1"], sa_in=m.sa["in"],
            sa_out=m.sa["conv_1"], retune=m.retune["conv_1"],
            leaky=BB, rounding=rounding)
    else:
        out = fp.int_maxpool(conv("conv_1", x_q, BB, sa_in=m.sa["in"]))
    out = fp.int_maxpool(conv("conv_2", out, BB, sa_in=m.sa["conv_1"]))
    out = fp.int_maxpool(conv("conv_3", out, BB, sa_in=m.sa["conv_2"]))
    out = fp.int_maxpool(conv("conv_4", out, BB, sa_in=m.sa["conv_3"]))
    c4 = conv("conv_5", out, BB, sa_in=m.sa["conv_4"])      # stride 16
    out = fp.int_maxpool(c4)
    out = conv("conv_6", out, BB, sa_in=m.sa["conv_5"])
    out = fp.int_zero_pad_maxpool_s1(out)
    c5 = conv("conv_7", out, BB, sa_in=m.sa["conv_6"])      # stride 32

    c5h = conv("conv_set_2", c5, sa_in=m.sa["conv_7"])
    up = conv("conv_1x1_2", c5h, sa_in=m.sa["conv_set_2"])
    up = fp.int_upsample2x_ac(up, rounding)                 # same scale

    # FPN concat: split conv keeps each branch's own scale exactly
    c4h = conv("conv_set_1",
               [(c4, m.sa["conv_5"]), (up, m.sa["conv_1x1_2"])])
    e2 = conv("extra_conv_2", c5h, sa_in=m.sa["conv_set_2"])
    pred_2 = conv("pred_2", e2, leaky=False,
                  sa_in=m.sa["extra_conv_2"])
    pred_1 = conv("pred_1", c4h, leaky=False,
                  sa_in=m.sa["conv_set_1"])
    return [
        pred_1.astype(jnp.float32) * 2.0 ** -m.sa["pred_1"],
        pred_2.astype(jnp.float32) * 2.0 ** -m.sa["pred_2"],
    ]


def quantize_pipeline_tiny(params_fp32, cfg: DetectorConfig,
                           calib_batches, max_images: int = 1000,
                           head_clip: float = None, fold_bn: bool = True,
                           states=None,
                           act_percentile: float = None,
                           weight_bitwidth: int = None,
                           per_channel: bool = False) -> Int8Tiny:
    """Full PTQ for tiny_yolo_v3: fold BN -> generic fake-quant +
    calibration -> accumulator headroom -> integer model. ``states``
    skips calibration (serve QAT's frozen scales); ``act_percentile``
    clips every conv tracker to the q-th percentile of |act|
    (quant/autoclip.py searches the best value);
    ``weight_bitwidth``/``per_channel`` select the weight grid (the
    calibration and headroom search run on the same grid)."""
    from yolo_tpu.models import tiny_yolo_v3
    from yolo_tpu.quant.bn_fold import fold_batch_norm
    from yolo_tpu.quant.generic import (
        calibrate_generic, fake_quantize_all_convs, quant_forward_generic)

    calib_batches = list(calib_batches)
    fused = fold_batch_norm(params_fp32) if fold_bn else params_fp32
    params_q = fake_quantize_all_convs(fused,
                                       weight_bitwidth=weight_bitwidth,
                                       per_channel=per_channel)
    if states is None:
        states = calibrate_generic(tiny_yolo_v3, params_q, cfg,
                                   calib_batches, max_images=max_images,
                                   head_clip=head_clip,
                                   act_percentile=act_percentile)

    @jax.jit
    def maxima_step(x):
        _, _, pre = quant_forward_generic(tiny_yolo_v3, params_q, x, cfg,
                                          states)
        return pre

    agg = None
    for x in calib_batches:
        pre = jax.device_get(maxima_step(jnp.asarray(x)))
        agg = pre if agg is None else [max(float(a), float(b))
                                       for a, b in zip(agg, pre)]
    return quantize_tiny_yolo_v3(fused, states, agg,
                                 weight_bitwidth=weight_bitwidth,
                                 per_channel=per_channel)


def _check_per_channel_plain(sw, s2d_requested):
    """Per-channel sw runs on the plain conv path only: the s2d entry
    forms phase-pack C_out and would need tiled sw tables (same contract
    as the slim engine's guard, fixed_point.int8_forward)."""
    vals = sw.values() if isinstance(sw, dict) else sw
    if s2d_requested and any(np.ndim(s) for s in vals):
        raise ValueError(
            "per-channel weight scales run on the plain conv path only "
            "(the s2d entry forms phase-pack C_out); rebuild the detect "
            "fn without input_s2d/s2d")


def _jit_detect(body, mesh):
    """jit a detect body; with a mesh, shard the batch over 'data'
    (multi-chip serving: weights replicate as jit constants, each chip
    runs its batch slice through conv+decode+NMS — same contract as
    int8_graph.make_int8_detect_fn)."""
    if mesh is None:
        return jax.jit(body)
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_sh = NamedSharding(mesh, P("data"))
    return jax.jit(body, in_shardings=batch_sh,
                   out_shardings=(batch_sh,) * 4)


def make_int8_tiny_detect_fn(m: Int8Tiny, cfg: DetectorConfig,
                             rounding: str = "nearest",
                             input_s2d: bool = False, mesh=None):
    """Jitted end-to-end int8 tiny_yolo_v3 detector.

    Accepts float32 input (quantized in-graph) or int8 at scale
    2^sa['in'] — with ``input_s2d``, int8 input must be the padded
    space-to-depth serving layout (4x less host->device traffic AND the
    fused MXU conv_1+pool; float input still works, the transform then
    runs on device). With ``mesh`` the batch shards over 'data'."""
    from yolo_tpu import detector as D
    from yolo_tpu.ops import nms

    _check_per_channel_plain(m.sw, input_s2d)

    class _Mod:
        STRIDES = (16, 32)

        @staticmethod
        def forward(p, x, cfg, train=False):
            assert not train
            if x.dtype == jnp.int8:
                x_q = x
            else:
                x_q = fp.quantize_input(x, m.sa["in"])
                if input_s2d:
                    x_q = fp.s2d_input(x_q)
            return int8_tiny_forward(m, x_q, rounding,
                                     input_s2d=input_s2d)

    def detect(images):
        fp.check_serving_input(images, cfg, input_s2d)
        boxes, probs = D.predict(_Mod, None, images, cfg)
        return nms.batched_postprocess(
            boxes, probs, cfg.conf_thresh, cfg.nms_thresh,
            cfg.pre_nms_top_k, cfg.top_k)

    return _jit_detect(detect, mesh)


# ---------------------------------------------------------------------------
# yolo_v2: darknet19 + reorg passthrough, true-integer.
# ---------------------------------------------------------------------------

# conv call order of yolo_v2.forward (models/yolo_v2.py:37-50: darknet19
# sequences in order, then head). reorg is a pure int8 shuffle (scale-
# preserving); the passthrough concat is handled by int_conv_requant's
# split-conv (each branch keeps its own scale exactly).
_D19_SEQ_LENS = (("conv_1", 1), ("conv_2", 1), ("conv_3", 3),
                 ("conv_4", 3), ("conv_5", 5), ("conv_6", 5))
V2_CONV_ORDER = tuple(
    [f"{seq}.{j}" for seq, n in _D19_SEQ_LENS for j in range(n)] +
    ["convsets_1.0", "convsets_1.1", "route_layer", "convsets_2.0",
     "pred"])
# 3x3 convs pad 1; the 1x1 bottlenecks (odd indices of conv_3..conv_6),
# route_layer and pred pad 0 (reference backbone/darknet.py:40-108,
# models/yolo_v2.py:29-34)
_V2_PAD = {name: 0 if (name.split(".")[-1].isdigit() and
                       int(name.split(".")[-1]) % 2 == 1)
           else 1 for name in V2_CONV_ORDER}
_V2_PAD.update({"route_layer": 0, "pred": 0, "convsets_1.0": 1,
                "convsets_1.1": 1, "convsets_2.0": 1})


@dataclass
class Int8YoloV2:
    w_q: Dict[str, jnp.ndarray]
    b_q: Dict[str, jnp.ndarray]
    sw: Dict[str, int]
    sb: Dict[str, int]
    sa: Dict[str, int]
    retune: Dict[str, int]


def _flat_v2_params(fused) -> Dict[str, dict]:
    bb = fused["backbone"]
    flat = {}
    for seq, n in _D19_SEQ_LENS:
        for j in range(n):
            flat[f"{seq}.{j}"] = bb[seq][j]
    flat["convsets_1.0"] = fused["convsets_1"][0]
    flat["convsets_1.1"] = fused["convsets_1"][1]
    flat["route_layer"] = fused["route_layer"]
    flat["convsets_2.0"] = fused["convsets_2"][0]
    flat["pred"] = fused["pred"]
    return flat


def quantize_yolo_v2(fused, tracker_states: List[dict],
                     pre_maxima: List[float],
                     acc_bits: int = 16,
                     weight_bitwidth: int = None,
                     per_channel: bool = False) -> Int8YoloV2:
    """BN-fused yolo_v2 params + generic calibration -> integer model.
    weight_bitwidth/per_channel: see quantize_tiny_yolo_v3."""
    flat = jax.device_get(_flat_v2_params(fused))  # one transfer
    wb = weight_bitwidth or 8
    w_axis = -1 if per_channel else None
    w_q, b_q, sw, sb, sa, retune = {}, {}, {}, {}, {}, {}
    sa["in"] = q.tracker_sa_np(tracker_states[0])
    limit = 2.0 ** (acc_bits - 1)
    for i, name in enumerate(V2_CONV_ORDER):
        layer = flat[name]
        wq, sw[name] = q.quantize_pow2_np(layer["w"], wb,
                                          channel_axis=w_axis)
        bq, sb[name] = q.quantize_pow2_np(layer["b"])
        w_q[name] = np.clip(wq, fp.INT8_MIN, fp.INT8_MAX).astype(np.int8)
        b_q[name] = np.clip(bq, fp.INT8_MIN, fp.INT8_MAX).astype(np.int32)
        sa[name] = q.tracker_sa_np(tracker_states[i + 1])
        mx = float(pre_maxima[i])
        retune[name] = (acc_bits - 2 if mx <= 0 else
                        min(acc_bits - 2,
                            int(math.floor(math.log2(limit / mx)))))
    return Int8YoloV2(w_q, b_q, sw, sb, sa, retune)


def int8_yolo_v2_forward(m: Int8YoloV2, x_q: jnp.ndarray,
                         rounding: str = "nearest",
                         input_s2d: bool = False):
    """int8 input -> [pred] float head (stride 32), the integer version
    of models/yolo_v2.forward incl. the reorg passthrough concat.

    ``input_s2d``: ``x_q`` is the padded space-to-depth serving layout;
    conv_1.0 + its maxpool run as ONE fused MXU block conv at pooled
    resolution (bit-exact, same entry form as slim/tiny)."""
    from yolo_tpu.ops import blocks

    def conv(name, x, sa_in, leaky=True):
        return fp.int_conv_requant(
            x, m.w_q[name], m.b_q[name], sw=m.sw[name], sb=m.sb[name],
            sa_in=sa_in, sa_out=m.sa[name], retune=m.retune[name],
            padding=_V2_PAD[name], leaky=leaky, rounding=rounding)

    # darknet19 backbone slope 0.1, head convs 0.125 (see
    # int8_tiny_forward's note; fp._leaky_int_slope)
    def run_seq_int(seq, n, x, prev):
        for j in range(n):
            name = f"{seq}.{j}"
            x = conv(name, x, sa_in=m.sa[prev], leaky=0.1)
            prev = name
        return x, prev

    if input_s2d:
        out = fp.int8_conv_pool_s2d_core(
            x_q, m.w_q["conv_1.0"], m.b_q["conv_1.0"], c_in=3,
            sw=m.sw["conv_1.0"], sb=m.sb["conv_1.0"], sa_in=m.sa["in"],
            sa_out=m.sa["conv_1.0"], retune=m.retune["conv_1.0"],
            leaky=0.1, rounding=rounding)
        prev = "conv_1.0"
    else:
        out, prev = run_seq_int("conv_1", 1, x_q, "in")
        out = fp.int_maxpool(out)
    out, prev = run_seq_int("conv_2", 1, out, prev)
    out = fp.int_maxpool(out)
    out, prev = run_seq_int("conv_3", 3, out, prev)
    out = fp.int_maxpool(out)
    c4, prev4 = run_seq_int("conv_4", 3, out, prev)
    c5, prev5 = run_seq_int("conv_5", 5, fp.int_maxpool(c4), prev4)
    c6, prev6 = run_seq_int("conv_6", 5, fp.int_maxpool(c5), prev5)

    fp2 = conv("convsets_1.0", c6, sa_in=m.sa[prev6])
    fp2 = conv("convsets_1.1", fp2, sa_in=m.sa["convsets_1.0"])
    route = conv("route_layer", c5, sa_in=m.sa[prev5])
    fp1 = blocks.reorg(route, 2)  # pure int8 shuffle, scale-preserving

    # passthrough concat [fp1, fp2]: split conv, exact per-branch scales
    head = conv("convsets_2.0",
                [(fp1, m.sa["route_layer"]), (fp2, m.sa["convsets_1.1"])],
                sa_in=None)
    pred = conv("pred", head, sa_in=m.sa["convsets_2.0"], leaky=False)
    return [pred.astype(jnp.float32) * 2.0 ** -m.sa["pred"]]


def quantize_pipeline_yolo_v2(params_fp32, cfg: DetectorConfig,
                              calib_batches, max_images: int = 1000,
                              head_clip: float = None,
                              fold_bn: bool = True,
                              states=None,
                              act_percentile: float = None,
                              weight_bitwidth: int = None,
                              per_channel: bool = False) -> Int8YoloV2:
    """Full PTQ for yolo_v2: fold BN -> generic fake-quant + calibration
    -> accumulator headroom -> integer model. ``states`` skips
    calibration (serve QAT's frozen scales); ``act_percentile`` clips
    every conv tracker to the q-th percentile of |act|;
    ``weight_bitwidth``/``per_channel`` select the weight grid."""
    from yolo_tpu.models import yolo_v2
    from yolo_tpu.quant.bn_fold import fold_batch_norm
    from yolo_tpu.quant.generic import (
        calibrate_generic, fake_quantize_all_convs, quant_forward_generic)

    calib_batches = list(calib_batches)
    fused = fold_batch_norm(params_fp32) if fold_bn else params_fp32
    params_q = fake_quantize_all_convs(fused,
                                       weight_bitwidth=weight_bitwidth,
                                       per_channel=per_channel)
    if states is None:
        states = calibrate_generic(yolo_v2, params_q, cfg, calib_batches,
                                   max_images=max_images,
                                   head_clip=head_clip,
                                   act_percentile=act_percentile)

    @jax.jit
    def maxima_step(x):
        _, _, pre = quant_forward_generic(yolo_v2, params_q, x, cfg,
                                          states)
        return pre

    agg = None
    for x in calib_batches:
        pre = jax.device_get(maxima_step(jnp.asarray(x)))
        agg = pre if agg is None else [max(float(a), float(b))
                                       for a, b in zip(agg, pre)]
    return quantize_yolo_v2(fused, states, agg,
                            weight_bitwidth=weight_bitwidth,
                            per_channel=per_channel)


def make_int8_yolo_v2_detect_fn(m: Int8YoloV2, cfg: DetectorConfig,
                                rounding: str = "nearest",
                                input_s2d: bool = False, mesh=None):
    """Jitted end-to-end int8 yolo_v2 detector.

    Accepts float32 input (quantized in-graph) or int8 at scale
    2^sa['in'] — with ``input_s2d``, int8 input must be the padded
    space-to-depth serving layout (see make_int8_tiny_detect_fn).
    With ``mesh`` the batch shards over 'data'."""
    from yolo_tpu import detector as D
    from yolo_tpu.ops import nms

    _check_per_channel_plain(m.sw, input_s2d)

    class _Mod:
        STRIDES = (32,)

        @staticmethod
        def forward(p, x, cfg, train=False):
            assert not train
            if x.dtype == jnp.int8:
                x_q = x
            else:
                x_q = fp.quantize_input(x, m.sa["in"])
                if input_s2d:
                    x_q = fp.s2d_input(x_q)
            return int8_yolo_v2_forward(m, x_q, rounding,
                                        input_s2d=input_s2d)

    def detect(images):
        fp.check_serving_input(images, cfg, input_s2d)
        boxes, probs = D.predict(_Mod, None, images, cfg)
        return nms.batched_postprocess(
            boxes, probs, cfg.conf_thresh, cfg.nms_thresh,
            cfg.pre_nms_top_k, cfg.top_k)

    return _jit_detect(detect, mesh)
