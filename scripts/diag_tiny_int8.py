"""Diagnose the tiny_yolo_v3 integer-vs-sim mAP gap (round-4 finding).

The 512-image CI run exposed a real gap the 48-image split hid:
integer engine 0.5200 vs fake-quant sim 0.5425 (fp32 0.5702). The two
candidate rounding sources unique to the integer datapath:

  (a) the FPN upsample's extra round-to-grid (int_upsample2x_ac rounds
      the exact interpolation back to int8 at the same scale; the sim
      feeds the off-grid values straight into the next fake-quant tap);
  (b) the per-conv double rounding (shift to the retune scale, then to
      sa_out) vs the sim's single fake-quant round per tap.

This script ablates (a): an integer engine whose up branch keeps the
interpolation EXACT — remainder trick: 4*interp is an exact integer, so
up = q (int8 at scale sa) + rem (4*interp - 4q in [-2,2], int8 at scale
sa+2), both fed through the split-conv path (two accumulators, shifted
to the common retune scale — no rounding at the upsample at all). If
mAP recovers toward the sim, (a) is the cause and the exact form
becomes a product option.

Run on TPU (after scripts/quant_parity_v3.py cached the checkpoint):
  python scripts/diag_tiny_int8.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.config import get_config
from yolo_tpu.data import BaseTransform, BatchLoader, SyntheticDetection
from yolo_tpu.detector import Detector
from yolo_tpu.eval.voc_eval import VOCEvaluator, bootstrap_delta_ci
from yolo_tpu.ops import blocks, nms
from yolo_tpu.quant import fixed_point as fp
from yolo_tpu.quant.int8_models import (
    _TINY_SPATIAL, Int8Tiny, make_int8_tiny_detect_fn,
    quantize_pipeline_tiny)
from yolo_tpu.utils.checkpoint import load_checkpoint


def int8_tiny_forward_exact_up(m: Int8Tiny, x_q, rounding="nearest"):
    """int8_tiny_forward with the EXACT up branch (remainder trick)."""

    def conv(name, x, leaky=True, sa_in=None):
        return fp.int_conv_requant(
            x, m.w_q[name], m.b_q[name], sw=m.sw[name], sb=m.sb[name],
            sa_in=sa_in, sa_out=m.sa[name], retune=m.retune[name],
            padding=_TINY_SPATIAL[name], leaky=leaky, rounding=rounding)

    out = fp.int_maxpool(conv("conv_1", x_q, sa_in=m.sa["in"]))
    out = fp.int_maxpool(conv("conv_2", out, sa_in=m.sa["conv_1"]))
    out = fp.int_maxpool(conv("conv_3", out, sa_in=m.sa["conv_2"]))
    out = fp.int_maxpool(conv("conv_4", out, sa_in=m.sa["conv_3"]))
    c4 = conv("conv_5", out, sa_in=m.sa["conv_4"])
    out = fp.int_maxpool(c4)
    out = conv("conv_6", out, sa_in=m.sa["conv_5"])
    out = fp.int_zero_pad_maxpool_s1(out)
    c5 = conv("conv_7", out, sa_in=m.sa["conv_6"])

    c5h = conv("conv_set_2", c5, sa_in=m.sa["conv_7"])
    up_in = conv("conv_1x1_2", c5h, sa_in=m.sa["conv_set_2"])

    # exact upsample: v4 = 4*interp is integer; q = its int8 rounding at
    # the base scale, rem = v4 - 4q in [-2, 2] carried at scale sa+2
    v4 = blocks.upsample2x_align_corners(
        up_in.astype(jnp.float32)) * 4.0
    v4 = jnp.round(v4)  # exact: kills float eps only
    q = jnp.clip(jnp.round(v4 / 4.0), fp.INT8_MIN, fp.INT8_MAX
                 ).astype(jnp.int8)
    rem = (v4 - 4.0 * q.astype(jnp.float32)).astype(jnp.int8)
    sa_up = m.sa["conv_1x1_2"]

    # split conv with the up-channel weight slice used TWICE (q at the
    # base scale, rem at sa+2): c_in offsets passed explicitly
    name = "conv_set_1"
    cin_c4 = c4.shape[-1]
    w = m.w_q[name]
    w_c4 = jax.lax.slice_in_dim(w, 0, cin_c4, axis=2)
    w_up = jax.lax.slice_in_dim(w, cin_c4, w.shape[2], axis=2)

    def part(xq, w_part, sa):
        acc = jax.lax.conv_general_dilated(
            xq.astype(jnp.int8), w_part, window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return fp._shift(acc, m.sw[name] + sa - m.retune[name],
                         rounding, jnp)

    acc = (part(c4, w_c4, m.sa["conv_5"]) + part(q, w_up, sa_up) +
           part(rem, w_up, sa_up + 2))
    acc = acc + fp._shift(m.b_q[name].astype(jnp.int32),
                          m.sb[name] - m.retune[name], rounding, jnp)
    acc = jnp.clip(acc, fp.INT16_MIN, fp.INT16_MAX)
    acc = fp._leaky_int(acc, rounding, jnp)
    c4h = fp._shift(acc, m.retune[name] - m.sa[name], rounding, jnp)
    c4h = jnp.clip(c4h, fp.INT8_MIN, fp.INT8_MAX).astype(jnp.int8)

    e2 = conv("extra_conv_2", c5h, sa_in=m.sa["conv_set_2"])
    pred_2 = conv("pred_2", e2, leaky=False, sa_in=m.sa["extra_conv_2"])
    pred_1 = conv("pred_1", c4h, leaky=False, sa_in=m.sa["conv_set_1"])
    return [
        pred_1.astype(jnp.float32) * 2.0 ** -m.sa["pred_1"],
        pred_2.astype(jnp.float32) * 2.0 ** -m.sa["pred_2"],
    ]


def main():
    size = 64
    cfg = get_config("tiny_yolo_v3", "mask", input_size=(size, size),
                     conf_thresh=0.01)
    det = Detector(cfg)
    params, _ = load_checkpoint("/tmp/quant_parity_tiny_yolo_v3.msgpack")

    train_ds = SyntheticDetection((size, size), num_classes=2,
                                  length=128,
                                  transform=BaseTransform((size, size)))
    val_ds = SyntheticDetection((size, size), num_classes=2, length=512,
                                transform=BaseTransform((size, size)),
                                seed=99)
    evaluator = VOCEvaluator(val_ds, 2, (size, size), batch_size=64)
    calib = [imgs for imgs, _ in
             list(BatchLoader(train_ds, 16, shuffle=False,
                              num_workers=4))][:8]

    from yolo_tpu.quant.autoclip import select_head_clip

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--head_clip", type=float, default=None,
                    help="None = autoclip; 0 = no cap")
    aa = ap.parse_args()
    if aa.head_clip is None:
        auto_cap, _ = select_head_clip("tiny_yolo_v3", params, cfg,
                                       calib)
    else:
        auto_cap = aa.head_clip if aa.head_clip > 0 else None
    print(f"head_clip = {auto_cap}")
    m = quantize_pipeline_tiny(params, cfg, calib, head_clip=auto_cap)

    results, raw = {}, {}

    def run(name, detect):
        results[name] = evaluator.evaluate(detect)
        raw[name] = evaluator.raw
        print(f"  [{name}] mAP = {results[name]:.4f}", flush=True)

    stock = make_int8_tiny_detect_fn(m, cfg)
    run("integer_stock",
        lambda im: stock(np.asarray(im, np.float32)))

    from yolo_tpu import detector as D

    class _ModExact:
        STRIDES = (16, 32)

        @staticmethod
        def forward(p, x, cfg_, train=False):
            x_q = fp.quantize_input(x, m.sa["in"])
            return int8_tiny_forward_exact_up(m, x_q)

    @jax.jit
    def exact_detect(images):
        boxes, probs = D.predict(_ModExact, None, images, cfg)
        return nms.batched_postprocess(
            boxes, probs, cfg.conf_thresh, cfg.nms_thresh,
            cfg.pre_nms_top_k, cfg.top_k)

    run("integer_exact_up",
        lambda im: exact_detect(jnp.asarray(im, jnp.float32)))

    # ---- variant (b): int8 convs + FLOAT epilogue (single rounding per
    # tap, like the sim) — isolates the int16 two-shift requant chain.
    def conv_f(name, x, sa_in, leaky=True):
        parts = x if isinstance(x, (list, tuple)) else [(x, sa_in)]
        acc, c_ofs = None, 0
        for xq, sa in parts:
            c = xq.shape[-1]
            w_part = jax.lax.slice_in_dim(m.w_q[name], c_ofs,
                                          c_ofs + c, axis=2)
            c_ofs += c
            p = jax.lax.conv_general_dilated(
                xq.astype(jnp.int8), w_part, window_strides=(1, 1),
                padding=((_TINY_SPATIAL[name],) * 2,) * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = p.astype(jnp.float32) * 2.0 ** -(m.sw[name] + sa)
            acc = y if acc is None else acc + y
        acc = acc + m.b_q[name].astype(jnp.float32) * 2.0 ** -m.sb[name]
        if leaky:
            acc = jnp.where(acc > 0, acc, acc * 0.125)
        q = jnp.round(acc * 2.0 ** m.sa[name])
        return jnp.clip(q, fp.INT8_MIN, fp.INT8_MAX).astype(jnp.int8)

    def forward_float_epi(x_q):
        out = fp.int_maxpool(conv_f("conv_1", x_q, m.sa["in"]))
        out = fp.int_maxpool(conv_f("conv_2", out, m.sa["conv_1"]))
        out = fp.int_maxpool(conv_f("conv_3", out, m.sa["conv_2"]))
        out = fp.int_maxpool(conv_f("conv_4", out, m.sa["conv_3"]))
        c4 = conv_f("conv_5", out, m.sa["conv_4"])
        out = fp.int_maxpool(c4)
        out = conv_f("conv_6", out, m.sa["conv_5"])
        out = fp.int_zero_pad_maxpool_s1(out)
        c5 = conv_f("conv_7", out, m.sa["conv_6"])
        c5h = conv_f("conv_set_2", c5, m.sa["conv_7"])
        up = conv_f("conv_1x1_2", c5h, m.sa["conv_set_2"])
        up = fp.int_upsample2x_ac(up)
        c4h = conv_f("conv_set_1",
                     [(c4, m.sa["conv_5"]), (up, m.sa["conv_1x1_2"])],
                     None)
        e2 = conv_f("extra_conv_2", c5h, m.sa["conv_set_2"])
        pred_2 = conv_f("pred_2", e2, m.sa["extra_conv_2"],
                        leaky=False)
        pred_1 = conv_f("pred_1", c4h, m.sa["conv_set_1"], leaky=False)
        return [
            pred_1.astype(jnp.float32) * 2.0 ** -m.sa["pred_1"],
            pred_2.astype(jnp.float32) * 2.0 ** -m.sa["pred_2"],
        ]

    class _ModF:
        STRIDES = (16, 32)

        @staticmethod
        def forward(p, x, cfg_, train=False):
            return forward_float_epi(fp.quantize_input(x, m.sa["in"]))

    @jax.jit
    def float_epi_detect(images):
        boxes, probs = D.predict(_ModF, None, images, cfg)
        return nms.batched_postprocess(
            boxes, probs, cfg.conf_thresh, cfg.nms_thresh,
            cfg.pre_nms_top_k, cfg.top_k)

    run("integer_float_epilogue",
        lambda im: float_epi_detect(jnp.asarray(im, jnp.float32)))

    # ---- combo: float epilogue AND off-grid upsample (the up branch
    # feeds conv_set_1 as float, like the sim). Up to f32 associativity
    # this SHOULD equal the fake-quant sim — if it does, the sim-engine
    # gap is fully accounted as (upsample round) + (int requant chain),
    # superadditive.
    def forward_combo(x_q):
        out = fp.int_maxpool(conv_f("conv_1", x_q, m.sa["in"]))
        out = fp.int_maxpool(conv_f("conv_2", out, m.sa["conv_1"]))
        out = fp.int_maxpool(conv_f("conv_3", out, m.sa["conv_2"]))
        out = fp.int_maxpool(conv_f("conv_4", out, m.sa["conv_3"]))
        c4 = conv_f("conv_5", out, m.sa["conv_4"])
        out = fp.int_maxpool(c4)
        out = conv_f("conv_6", out, m.sa["conv_5"])
        out = fp.int_zero_pad_maxpool_s1(out)
        c5 = conv_f("conv_7", out, m.sa["conv_6"])
        c5h = conv_f("conv_set_2", c5, m.sa["conv_7"])
        up8 = conv_f("conv_1x1_2", c5h, m.sa["conv_set_2"])
        up = blocks.upsample2x_align_corners(
            up8.astype(jnp.float32) * 2.0 ** -m.sa["conv_1x1_2"])
        # conv_set_1 in float for the off-grid up branch (diagnostic)
        name = "conv_set_1"
        cin_c4 = c4.shape[-1]
        wf = m.w_q[name].astype(jnp.float32) * 2.0 ** -m.sw[name]
        xf = jnp.concatenate(
            [c4.astype(jnp.float32) * 2.0 ** -m.sa["conv_5"], up], -1)
        acc = jax.lax.conv_general_dilated(
            xf, wf, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        acc = acc + m.b_q[name].astype(jnp.float32) * 2.0 ** -m.sb[name]
        acc = jnp.where(acc > 0, acc, acc * 0.125)
        c4h = jnp.clip(jnp.round(acc * 2.0 ** m.sa[name]),
                       fp.INT8_MIN, fp.INT8_MAX).astype(jnp.int8)
        e2 = conv_f("extra_conv_2", c5h, m.sa["conv_set_2"])
        pred_2 = conv_f("pred_2", e2, m.sa["extra_conv_2"],
                        leaky=False)
        pred_1 = conv_f("pred_1", c4h, m.sa["conv_set_1"], leaky=False)
        return [
            pred_1.astype(jnp.float32) * 2.0 ** -m.sa["pred_1"],
            pred_2.astype(jnp.float32) * 2.0 ** -m.sa["pred_2"],
        ]

    class _ModCombo:
        STRIDES = (16, 32)

        @staticmethod
        def forward(p, x, cfg_, train=False):
            return forward_combo(fp.quantize_input(x, m.sa["in"]))

    @jax.jit
    def combo_detect(images):
        boxes, probs = D.predict(_ModCombo, None, images, cfg)
        return nms.batched_postprocess(
            boxes, probs, cfg.conf_thresh, cfg.nms_thresh,
            cfg.pre_nms_top_k, cfg.top_k)

    run("float_epi_plus_offgrid_up",
        lambda im: combo_detect(jnp.asarray(im, jnp.float32)))

    # and the sim itself on the same cap, for the direct target
    from yolo_tpu.quant.generic import quantize_detector

    _, _, sim_detect = quantize_detector(det, params, calib,
                                         head_clip=auto_cap)
    run("fakequant_sim",
        lambda im: sim_detect(np.asarray(im, np.float32)))

    gts = raw["integer_stock"][1]
    for k in ("integer_exact_up", "integer_float_epilogue",
              "float_epi_plus_offgrid_up", "fakequant_sim"):
        d, lo, hi = bootstrap_delta_ci(raw[k][0],
                                       raw["integer_stock"][0],
                                       gts, n_boot=300)
        print(f"\n{k} minus stock: {d * 100:+.2f} pts "
              f"[{lo * 100:+.2f}, {hi * 100:+.2f}]")


if __name__ == "__main__":
    main()
