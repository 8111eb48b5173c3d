"""True-integer INT8 yolo_v3 / yolo_v3_spp.

Completes the BASELINE.json "yolo_v3 / yolo_v3_spp — full Darknet-53
backbone + SPP, INT8 end-to-end" config with real integer arithmetic:
int8 convs (incl. stride-2 backbone convs) with int16-saturating
accumulators and shift requantization, exact residual adds (operands
aligned to the finer scale in int32, requantized to the sum's calibrated
tracker — see ops/blocks.residual_add), int8 SPP pools, split-convs over
the FPN concats, and fixed-point 2x upsamples.

The layer *program* — the exact conv/residual/concat call order of the
float forward (models/darknet.darknet53 + models/yolo_v3._forward) — is
generated once and walked by both the quantizer and the executor, so the
generic quantization context's call-ordered tracker scales and
pre-activation maxima line up by construction.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.config import DetectorConfig
from yolo_tpu.models import yolo_v3 as v3
from yolo_tpu.models import yolo_v3_spp as v3spp
from yolo_tpu.models.darknet import _D53_LAYERS, _res_specs
from yolo_tpu.quant import fixed_point as fp
from yolo_tpu.quant import quantize as q


def _program(spp: bool) -> List[Tuple]:
    """Ops: ('conv', path, stride, padding, leaky) | ('push',) | ('res',)
    | ('save', name) | ('load', name) | ('spp',) | ('up',) |
    ('concat', left_name)."""
    ops: List[Tuple] = []
    feat_names = {"layer_3": "c3", "layer_4": "c4", "layer_5": "c5"}
    # backbone convs use the darknet slope 0.1 (models/darknet.py SLOPE);
    # head convs use 0.125 (leaky=True). The integer engine honors both
    # (fp._leaky_int_slope) — r3 ran the whole net at 0.125.
    for name, entry, ch, nblocks in _D53_LAYERS:
        for j, (ks, ci, co, st, pad) in enumerate(entry):
            ops.append(("conv", ("backbone", name, "entry", j), st, pad,
                        0.1))
        for k in range(nblocks):
            specs = _res_specs(ch)
            ops.append(("push",))
            for j, (ks, ci, co, st, pad) in enumerate(specs):
                ops.append(("conv", ("backbone", name, "blocks", k, j),
                            st, pad, 0.1))
            ops.append(("res",))
        if name in feat_names:
            ops.append(("save", feat_names[name]))

    conv_set_3 = v3spp.CONV_SET_3_SPP if spp else v3.CONV_SET_3
    if spp:
        ops.append(("spp",))

    def seq(prefix, specs, concat_left=None):
        for j, (ks, ci, co, st, pad) in enumerate(specs):
            ops.append(("conv", (prefix, j), st, pad, True))

    seq("conv_set_3", conv_set_3)
    ops.append(("save", "fmp3"))
    ops.append(("conv", ("conv_1x1_3",), 1, 0, True))
    ops.append(("up",))
    ops.append(("concat", "c4"))
    seq("conv_set_2", v3.CONV_SET_2)
    ops.append(("save", "fmp2"))
    ops.append(("conv", ("conv_1x1_2",), 1, 0, True))
    ops.append(("up",))
    ops.append(("concat", "c3"))
    seq("conv_set_1", v3.CONV_SET_1)
    ops.append(("save", "fmp1"))
    # extra convs then preds, matching models/yolo_v3.py:85-93 call order
    for fm, extra in (("fmp3", "extra_conv_3"), ("fmp2", "extra_conv_2"),
                      ("fmp1", "extra_conv_1")):
        ops.append(("load", fm))
        ops.append(("conv", (extra,), 1, 1, True))
        ops.append(("save", extra))
    for extra, pred in (("extra_conv_3", "pred_3"),
                        ("extra_conv_2", "pred_2"),
                        ("extra_conv_1", "pred_1")):
        ops.append(("load", extra))
        ops.append(("conv", (pred,), 1, 0, False))
        ops.append(("save", pred))
    return ops


def _get_path(params, path):
    node = params
    for p in path:
        node = node[p]
    return node


@dataclass
class Int8YoloV3:
    spp: bool
    w_q: List[jnp.ndarray]
    b_q: List[jnp.ndarray]
    sw: List[int]
    sb: List[int]
    sa_in: int
    tap_sa: List[int]        # per tap (convs + residual sums), call order
    retune: List[int]        # per conv
    program: List[Tuple] = field(repr=False, default=None)


def quantize_yolo_v3(fused, tracker_states: List[dict],
                     pre_maxima: List[float], spp: bool = False,
                     acc_bits: int = 16,
                     weight_bitwidth: int = None,
                     per_channel: bool = False) -> Int8YoloV3:
    """BN-fused yolo_v3(-spp) params + generic calibration -> integer
    model. tracker_states index 0 is the input tap.
    weight_bitwidth/per_channel: fixed_point.quantize_model's weight
    grid (per-channel sw is an int32 [C_out] array; plain conv path
    only — see make_int8_yolo_v3_detect_fn)."""
    program = _program(spp)
    fused = jax.device_get(fused)  # one transfer; numpy math below
    wb = weight_bitwidth or 8
    w_axis = -1 if per_channel else None
    w_q, b_q, sw, sb, retune = [], [], [], [], []
    limit = 2.0 ** (acc_bits - 1)
    conv_i = 0
    for op in program:
        if op[0] != "conv":
            continue
        layer = _get_path(fused, op[1])
        wq, ws = q.quantize_pow2_np(layer["w"], wb, channel_axis=w_axis)
        bq, bs = q.quantize_pow2_np(layer["b"])
        w_q.append(np.clip(wq, fp.INT8_MIN, fp.INT8_MAX).astype(np.int8))
        b_q.append(np.clip(bq, fp.INT8_MIN, fp.INT8_MAX).astype(np.int32))
        sw.append(ws)
        sb.append(bs)
        mx = float(pre_maxima[conv_i])
        retune.append(acc_bits - 2 if mx <= 0 else
                      min(acc_bits - 2,
                          int(math.floor(math.log2(limit / mx)))))
        conv_i += 1
    tap_sa = [q.tracker_sa_np(st) for st in tracker_states[1:]]
    sa_in = q.tracker_sa_np(tracker_states[0])
    return Int8YoloV3(spp=spp, w_q=w_q, b_q=b_q, sw=sw, sb=sb,
                      sa_in=sa_in, tap_sa=tap_sa, retune=retune,
                      program=program)


def int8_yolo_v3_forward(m: Int8YoloV3, x_q: jnp.ndarray,
                         rounding: str = "nearest",
                         s2d="entry", limit: int = None,
                         input_s2d: bool = False):
    """int8 input -> [pred_1, pred_2, pred_3] float heads (s8,16,32).

    ``s2d``: space-to-depth execution of the stride-2 structure —
    bit-exact, lifts small-C_in high-resolution convs from the VPU onto
    the MXU (contraction 16*C_in). Modes: "entry" (default; fuse the
    darknet conv1+conv2 entry pair in s2d space), "stride2" (also every
    other stride-2 backbone conv), True (both), False (plain convs).
    Measured on v5e @416² b64 (uncontended): entry 1184 img/s vs plain
    1117; stride2 924 — the deeper stride-2 convs are MXU-viable
    already, so the s2d relayout only costs (docs/PERFORMANCE.md v3
    table).

    ``limit``: stop after the first ``limit`` program ops and return the
    list of live int8 tensors (stream/slots/res stack) — the prefix-
    graph attribution hook (scripts/profile_v3.py); None = full forward.
    """
    s2d_entry = s2d in (True, "entry") or input_s2d
    s2d_stride2 = s2d in (True, "stride2")
    if input_s2d:
        # x_q is the padded serving s2d layout (fp.s2d_input / native
        # layout='s2d'); the entry pair consumes its odd-aligned
        # block-slice directly — zero on-device relayout. Requires the
        # darknet conv1+conv2 entry (all v3-family programs have it).
        p0, p1_ = m.program[0], m.program[1]
        if not (p0[0] == "conv" and p0[2] == 1 and p0[3] == 1 and p0[4]
                and p1_[0] == "conv" and p1_[2] == 2 and p1_[3] == 1
                and p1_[4]):
            raise ValueError("input_s2d requires the darknet "
                             "conv1+conv2 entry pair")
        x_q = fp.s2d_entry_from_input(x_q)
    stream = (x_q, m.sa_in)     # (int8 array or parts-list, scale)
    slots: Dict[str, Tuple] = {}
    res_stack: List[Tuple] = []
    tap_i = 0
    conv_i = 0
    skip_next = 0
    for oi, op in enumerate(m.program):
        if limit is not None and oi >= limit:
            break
        kind = op[0]
        if skip_next:
            skip_next -= 1
            continue
        if kind == "conv":
            _, _, stride, padding, leaky = op
            sa_out = m.tap_sa[tap_i]
            x, sa = stream
            nxt = m.program[oi + 1] if oi + 1 < len(m.program) else None
            if (s2d_entry and conv_i == 0 and stride == 1 and padding == 1
                    and leaky and not isinstance(x, (list, tuple))
                    and nxt is not None and nxt[0] == "conv"
                    and nxt[2] == 2 and nxt[3] == 1 and nxt[4]):
                # fused entry pair: conv1 + conv2 stay in s2d space
                sa_mid = sa_out
                sa_out2 = m.tap_sa[tap_i + 1]
                p1 = dict(sw=m.sw[conv_i], sb=m.sb[conv_i], sa_in=sa,
                          sa_out=sa_mid, retune=m.retune[conv_i])
                p2 = dict(sw=m.sw[conv_i + 1], sb=m.sb[conv_i + 1],
                          sa_in=sa_mid, sa_out=sa_out2,
                          retune=m.retune[conv_i + 1])
                out = fp.int8_entry_pair_s2d(
                    x, m.w_q[conv_i], m.b_q[conv_i], p1,
                    m.w_q[conv_i + 1], m.b_q[conv_i + 1], p2,
                    rounding=rounding, pre_s2d=input_s2d,
                    leaky=(leaky, nxt[4]))
                stream = (out, sa_out2)
                tap_i += 2
                conv_i += 2
                skip_next = 1
                continue
            if (s2d_stride2 and stride == 2 and padding == 1
                    and m.w_q[conv_i].shape[0] == 3
                    and not isinstance(x, (list, tuple))):
                out = fp.int8_conv_stride2_s2d(
                    x, m.w_q[conv_i], m.b_q[conv_i], sw=m.sw[conv_i],
                    sb=m.sb[conv_i], sa_in=sa, sa_out=sa_out,
                    retune=m.retune[conv_i], leaky=leaky,
                    rounding=rounding)
            else:
                # a conv directly feeding a 'res' folds the residual-add
                # chain into its epilogue (bit-exact; avoids an 11 ms
                # HBM round-trip at 208² — see int_conv_requant)
                residual = sa_res = None
                if (nxt is not None and nxt[0] == "res"
                        and (limit is None or oi + 1 < limit)):
                    r_q, sa_r = res_stack.pop()
                    # The skip tensor has two consumers (the block's 1x1
                    # conv and this add). Without a barrier XLA keeps
                    # BOTH producing convs' raw s32 accumulators in HBM
                    # (708 MB each at 208² b64) and requantizes in a
                    # separate fusion — the barrier pins the s8 form as
                    # the materialization boundary so each requant rides
                    # its conv epilogue (verified in compiled HLO).
                    residual = (jax.lax.optimization_barrier(r_q), sa_r)
                    sa_res = m.tap_sa[tap_i + 1]
                out = fp.int_conv_requant(
                    x, m.w_q[conv_i], m.b_q[conv_i], sw=m.sw[conv_i],
                    sb=m.sb[conv_i], sa_in=sa, sa_out=sa_out,
                    retune=m.retune[conv_i], padding=padding,
                    stride=stride, leaky=leaky, rounding=rounding,
                    residual=residual, sa_res=sa_res)
                if residual is not None:
                    stream = (out, sa_res)
                    tap_i += 2
                    conv_i += 1
                    skip_next = 1
                    continue
            stream = (out, sa_out)
            tap_i += 1
            conv_i += 1
        elif kind == "push":
            res_stack.append(stream)
        elif kind == "res":
            (y, sy) = stream
            (x, sx) = res_stack.pop()
            sa_out = m.tap_sa[tap_i]
            tap_i += 1
            stream = (fp.int_add_requant(y, sy, x, sx, sa_out, rounding),
                      sa_out)
        elif kind == "save":
            slots[op[1]] = stream
        elif kind == "load":
            stream = slots[op[1]]
        elif kind == "spp":
            x, sa = stream
            stream = (fp.int_spp(x), sa)
        elif kind == "up":
            x, sa = stream
            stream = (fp.int_upsample2x_ac(x, rounding), sa)
        elif kind == "concat":
            left, sl = slots[op[1]]
            x, sa = stream
            stream = ([(left, sl), (x, sa)], None)
        else:  # pragma: no cover
            raise ValueError(op)
    if limit is not None:
        live = [stream] + list(slots.values()) + res_stack
        out = []
        for t, _ in live:
            if isinstance(t, list):
                out.extend(x for x, _ in t)
            else:
                out.append(t)
        return out
    preds = []
    for name in ("pred_1", "pred_2", "pred_3"):
        x, sa = slots[name]
        preds.append(x.astype(jnp.float32) * 2.0 ** -sa)
    return preds


def quantize_pipeline_yolo_v3(params_fp32, cfg: DetectorConfig,
                              calib_batches, spp: bool = False,
                              max_images: int = 1000,
                              head_clip: float = None,
                              fold_bn: bool = True,
                              states=None,
                              act_percentile: float = None,
                              weight_bitwidth: int = None,
                              per_channel: bool = False
                              ) -> Int8YoloV3:
    """Full PTQ for yolo_v3(-spp): fold BN -> generic calibration ->
    headroom -> integer model.

    Pass ``states`` (call-ordered tracker list from calibrate_generic)
    to SKIP calibration and build on those frozen activation scales —
    e.g. the exact states a QAT fine-tune trained against. The headroom
    aggregation still runs (it depends on the weights).
    ``act_percentile`` clips every conv tracker to the q-th percentile
    of |act| during calibration (quant/autoclip.py)."""
    from yolo_tpu.quant.bn_fold import fold_batch_norm
    from yolo_tpu.quant.generic import (
        calibrate_generic, fake_quantize_all_convs, quant_forward_generic)

    module = v3spp if spp else v3
    calib_batches = list(calib_batches)
    fused = fold_batch_norm(params_fp32) if fold_bn else params_fp32
    params_q = fake_quantize_all_convs(fused,
                                       weight_bitwidth=weight_bitwidth,
                                       per_channel=per_channel)
    if states is None:
        states = calibrate_generic(module, params_q, cfg, calib_batches,
                                   max_images=max_images,
                                   head_clip=head_clip,
                                   act_percentile=act_percentile)

    @jax.jit
    def maxima_step(x):
        _, _, pre = quant_forward_generic(module, params_q, x, cfg, states)
        return pre

    agg = None
    for x in calib_batches:
        pre = jax.device_get(maxima_step(jnp.asarray(x)))
        agg = pre if agg is None else [max(float(a), float(b))
                                       for a, b in zip(agg, pre)]
    return quantize_yolo_v3(fused, states, agg, spp=spp,
                            weight_bitwidth=weight_bitwidth,
                            per_channel=per_channel)


def make_int8_yolo_v3_detect_fn(m: Int8YoloV3, cfg: DetectorConfig,
                                rounding: str = "nearest",
                                s2d="entry", input_s2d: bool = False,
                                mesh=None):
    """Jitted end-to-end int8 yolo_v3 detector.

    Accepts float32 input (quantized in-graph) or int8 at scale
    2^sa_in — with ``input_s2d``, int8 input must be the padded
    space-to-depth serving layout (fp.s2d_input / native layout='s2d');
    the darknet entry pair then consumes the transfer directly.
    With ``mesh`` the batch shards over 'data' (multi-chip serving)."""
    from yolo_tpu import detector as D
    from yolo_tpu.ops import nms
    from yolo_tpu.quant.int8_models import _jit_detect

    if any(np.ndim(s) for s in m.sw):
        # per-channel sw: the s2d entry/stride2 forms phase-pack C_out
        # and would need tiled sw tables — serve on the plain conv path
        if input_s2d:
            raise ValueError(
                "per-channel weight scales run on the plain conv path "
                "only; rebuild the detect fn without input_s2d")
        s2d = False

    class _Mod:
        STRIDES = (8, 16, 32)

        @staticmethod
        def forward(p, x, cfg, train=False):
            assert not train
            if x.dtype == jnp.int8:
                x_q = x
            else:
                x_q = fp.quantize_input(x, m.sa_in)
                if input_s2d:
                    x_q = fp.s2d_input(x_q)
            return int8_yolo_v3_forward(m, x_q, rounding, s2d=s2d,
                                        input_s2d=input_s2d)

    def detect(images):
        fp.check_serving_input(images, cfg, input_s2d)
        boxes, probs = D.predict(_Mod, None, images, cfg)
        return nms.batched_postprocess(
            boxes, probs, cfg.conf_thresh, cfg.nms_thresh,
            cfg.pre_nms_top_k, cfg.top_k)

    return _jit_detect(detect, mesh)
