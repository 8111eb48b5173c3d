"""YOLOv3-SPP: YOLOv3 with an SPP block in the coarse-scale head.

Identical to yolo_v3 except conv_set_3 starts with SPP (4x channel
concat) followed by a 4096->512 1x1 conv (reference
models/yolo_v3_spp.py:28-37).
"""

from __future__ import annotations

from yolo_tpu.models import yolo_v3
from yolo_tpu.models.common import cb

STRIDES = (8, 16, 32)

CONV_SET_3_SPP = [cb(1, 4096, 512), cb(3, 512, 1024, 1, 1),
                  cb(1, 1024, 512), cb(3, 512, 1024, 1, 1),
                  cb(1, 1024, 512)]


def init_params(rng, cfg, batch_norm: bool = True, dtype=None):
    return yolo_v3._init(rng, cfg, CONV_SET_3_SPP, use_spp=True,
                         batch_norm=batch_norm, dtype=dtype)


def forward(params, x, cfg, train: bool = False):
    return yolo_v3._forward(params, x, cfg, train, CONV_SET_3_SPP,
                            use_spp=True)
