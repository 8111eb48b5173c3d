"""tiny-YOLOv3: darknet_light backbone + 2-scale FPN head.

Topology parity with reference models/tiny_yolo_v3.py:9-39,181-199:
conv_set_2 (C5 1024->256 3x3), upsample(conv_1x1_2) concat with C4,
conv_set_1 (384->256 3x3) -> pred_1 (stride 16); extra_conv_2 -> pred_2
(stride 32). Outputs fine-to-coarse [s16, s32].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from yolo_tpu.models import darknet
from yolo_tpu.models.common import cb, init_seq, run_block
from yolo_tpu.ops import blocks

STRIDES = (16, 32)

_CONV_SET_2 = cb(3, 1024, 256, 1, 1)
_CONV_1X1_2 = cb(1, 256, 128)
_EXTRA_2 = cb(3, 256, 512, 1, 1)
_CONV_SET_1 = cb(3, 384, 256, 1, 1)


def init_params(rng, cfg, batch_norm: bool = True, dtype=None):
    keys = jax.random.split(rng, 6)
    pred_out = cfg.anchors_per_scale * (1 + 4 + cfg.num_classes)
    return {
        "backbone": darknet.init_darknet_light(keys[0], dtype=dtype),
        "conv_set_2": init_seq(keys[1], [_CONV_SET_2], batch_norm, dtype)[0],
        "conv_1x1_2": init_seq(keys[2], [_CONV_1X1_2], batch_norm, dtype)[0],
        "extra_conv_2": init_seq(keys[3], [_EXTRA_2], batch_norm, dtype)[0],
        "conv_set_1": init_seq(keys[4], [_CONV_SET_1], batch_norm, dtype)[0],
        "pred_2": blocks.init_conv(keys[5], 1, 512, pred_out, dtype=dtype),
        "pred_1": blocks.init_conv(
            jax.random.fold_in(keys[5], 1), 1, 256, pred_out, dtype=dtype),
    }


def forward(params, x, cfg, train: bool = False):
    new = {}
    (c4, c5), new["backbone"] = darknet.darknet_light(
        params["backbone"], x, train)

    c5h, new["conv_set_2"] = run_block(params["conv_set_2"], c5, train,
                                       padding=1)
    up, new["conv_1x1_2"] = run_block(params["conv_1x1_2"], c5h, train,
                                      padding=0)
    up = blocks.upsample2x_align_corners(up)

    c4h = jnp.concatenate([c4, up], axis=-1)
    c4h, new["conv_set_1"] = run_block(params["conv_set_1"], c4h, train,
                                       padding=1)

    e2, new["extra_conv_2"] = run_block(params["extra_conv_2"], c5h, train,
                                        padding=1)
    pred_2 = blocks.pred_conv(params["pred_2"], e2)
    pred_1 = blocks.pred_conv(params["pred_1"], c4h)

    outputs = [pred_1, pred_2]  # [s16, s32]
    if train:
        new["pred_1"] = params["pred_1"]
        new["pred_2"] = params["pred_2"]
        return outputs, new
    return outputs
