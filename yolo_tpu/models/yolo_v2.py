"""YOLOv2: darknet19 backbone + passthrough (reorg) head.

Topology parity with reference models/yolo_v2.py:9-40,165-178:
darknet19 -> 2x Conv1024 head; route 1x1 conv(512->64) on C5 + reorg(2)
concatenated in front of the head output; 1x1 prediction conv. Stride 32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from yolo_tpu.models import darknet
from yolo_tpu.models.common import cb, init_seq, run_block, run_seq
from yolo_tpu.ops import blocks

STRIDES = (32,)

_CONVSETS_1 = [cb(3, 1024, 1024, 1, 1), cb(3, 1024, 1024, 1, 1)]
_ROUTE = cb(1, 512, 64)
_CONVSETS_2 = [cb(3, 1280, 1024, 1, 1)]


def init_params(rng, cfg, batch_norm: bool = True, dtype=None):
    k_bb, k1, k_r, k2, k_p = jax.random.split(rng, 5)
    pred_out = cfg.anchors_per_scale * (1 + 4 + cfg.num_classes)
    return {
        "backbone": darknet.init_darknet19(k_bb, dtype=dtype),
        "convsets_1": init_seq(k1, _CONVSETS_1, batch_norm, dtype),
        "route_layer": init_seq(k_r, [_ROUTE], batch_norm, dtype)[0],
        "convsets_2": init_seq(k2, _CONVSETS_2, batch_norm, dtype),
        "pred": blocks.init_conv(k_p, 1, 1024, pred_out, bias=True,
                                 dtype=dtype),
    }


def forward(params, x, cfg, train: bool = False):
    new = {}
    (_, c5, c6), new["backbone"] = darknet.darknet19(
        params["backbone"], x, train)

    fp2, new["convsets_1"] = run_seq(
        params["convsets_1"], c6, _CONVSETS_1, train)
    route, new["route_layer"] = run_block(
        params["route_layer"], c5, train, padding=0)
    fp1 = blocks.reorg(route, 2)
    fp = jnp.concatenate([fp1, fp2], axis=-1)
    fp, new["convsets_2"] = run_seq(
        params["convsets_2"], fp, _CONVSETS_2, train)
    pred = blocks.pred_conv(params["pred"], fp)
    outputs = [pred]
    if train:
        new["pred"] = params["pred"]
        return outputs, new
    return outputs
