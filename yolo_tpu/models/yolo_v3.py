"""YOLOv3: darknet53 + 3-scale FPN head.

Topology parity with reference models/yolo_v3.py:9-62,204-260: per-scale
conv sets (1x1/3x3 alternating), top-down 2x bilinear (align_corners=True)
upsample + concat, extra 3x3 conv + 1x1 pred per scale. Head outputs are
returned fine-to-coarse ([s8, s16, s32]) matching the reference's
``preds = [pred_1, pred_2, pred_3]`` concat order (models/yolo_v3.py:233).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from yolo_tpu.models import darknet
from yolo_tpu.models.common import cb, init_seq, run_block, run_seq
from yolo_tpu.ops import blocks

STRIDES = (8, 16, 32)

# conv_set specs; yolo_v3_spp overrides CONV_SET_3 (SPP variant).
CONV_SET_3 = [cb(1, 1024, 512), cb(3, 512, 1024, 1, 1), cb(1, 1024, 512),
              cb(3, 512, 1024, 1, 1), cb(1, 1024, 512)]
CONV_SET_2 = [cb(1, 768, 256), cb(3, 256, 512, 1, 1), cb(1, 512, 256),
              cb(3, 256, 512, 1, 1), cb(1, 512, 256)]
CONV_SET_1 = [cb(1, 384, 128), cb(3, 128, 256, 1, 1), cb(1, 256, 128),
              cb(3, 128, 256, 1, 1), cb(1, 256, 128)]
_CONV_1X1_3 = cb(1, 512, 256)
_CONV_1X1_2 = cb(1, 256, 128)
_EXTRA_3 = cb(3, 512, 1024, 1, 1)
_EXTRA_2 = cb(3, 256, 512, 1, 1)
_EXTRA_1 = cb(3, 128, 256, 1, 1)


def _init(rng, cfg, conv_set_3, use_spp, batch_norm=True, dtype=None):
    keys = jax.random.split(rng, 10)
    pred_out = cfg.anchors_per_scale * (1 + 4 + cfg.num_classes)
    return {
        "backbone": darknet.init_darknet53(keys[0], dtype=dtype),
        "conv_set_3": init_seq(keys[1], conv_set_3, batch_norm, dtype),
        "conv_set_2": init_seq(keys[2], CONV_SET_2, batch_norm, dtype),
        "conv_set_1": init_seq(keys[3], CONV_SET_1, batch_norm, dtype),
        "conv_1x1_3": init_seq(keys[4], [_CONV_1X1_3], batch_norm, dtype)[0],
        "conv_1x1_2": init_seq(keys[5], [_CONV_1X1_2], batch_norm, dtype)[0],
        "extra_conv_3": init_seq(keys[6], [_EXTRA_3], batch_norm, dtype)[0],
        "extra_conv_2": init_seq(keys[7], [_EXTRA_2], batch_norm, dtype)[0],
        "extra_conv_1": init_seq(keys[8], [_EXTRA_1], batch_norm, dtype)[0],
        "pred_3": blocks.init_conv(keys[9], 1, 1024, pred_out, dtype=dtype),
        "pred_2": blocks.init_conv(
            jax.random.fold_in(keys[9], 1), 1, 512, pred_out, dtype=dtype),
        "pred_1": blocks.init_conv(
            jax.random.fold_in(keys[9], 2), 1, 256, pred_out, dtype=dtype),
    }


def init_params(rng, cfg, batch_norm: bool = True, dtype=None):
    return _init(rng, cfg, CONV_SET_3, use_spp=False, batch_norm=batch_norm,
                 dtype=dtype)


def _forward(params, x, cfg, train, conv_set_3, use_spp):
    new = {}
    (c3, c4, c5), new["backbone"] = darknet.darknet53(
        params["backbone"], x, train)

    if use_spp:
        c5 = blocks.spp(c5)  # reference models/yolo_v3_spp.py:31
    fmp3, new["conv_set_3"] = run_seq(params["conv_set_3"], c5, conv_set_3,
                                      train)
    up3, new["conv_1x1_3"] = run_block(params["conv_1x1_3"], fmp3, train,
                                       padding=0)
    up3 = blocks.upsample2x_align_corners(up3)

    fmp2 = jnp.concatenate([c4, up3], axis=-1)
    fmp2, new["conv_set_2"] = run_seq(params["conv_set_2"], fmp2, CONV_SET_2,
                                      train)
    up2, new["conv_1x1_2"] = run_block(params["conv_1x1_2"], fmp2, train,
                                       padding=0)
    up2 = blocks.upsample2x_align_corners(up2)

    fmp1 = jnp.concatenate([c3, up2], axis=-1)
    fmp1, new["conv_set_1"] = run_seq(params["conv_set_1"], fmp1, CONV_SET_1,
                                      train)

    e3, new["extra_conv_3"] = run_block(params["extra_conv_3"], fmp3, train,
                                        padding=1)
    e2, new["extra_conv_2"] = run_block(params["extra_conv_2"], fmp2, train,
                                        padding=1)
    e1, new["extra_conv_1"] = run_block(params["extra_conv_1"], fmp1, train,
                                        padding=1)
    pred_3 = blocks.pred_conv(params["pred_3"], e3)
    pred_2 = blocks.pred_conv(params["pred_2"], e2)
    pred_1 = blocks.pred_conv(params["pred_1"], e1)

    outputs = [pred_1, pred_2, pred_3]  # fine -> coarse, STRIDES order
    if train:
        for k in ("pred_1", "pred_2", "pred_3"):
            new[k] = params[k]
        return outputs, new
    return outputs


def forward(params, x, cfg, train: bool = False):
    return _forward(params, x, cfg, train, CONV_SET_3, use_spp=False)
