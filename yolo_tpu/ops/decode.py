"""YOLO head decode: prediction splitting + anchor-grid box decode.

Pure-JAX, fully in-graph equivalents of the reference's in-model decode
(reference models/slim_yolo_v2.py:91-143, models/yolo_v2.py:42-96). All
shapes are static so the whole path jits and fuses with the backbone.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_grid(input_size: Tuple[int, int], stride: int,
              anchor_size: Sequence[Tuple[float, float]]):
    """Build (grid_xy [1, HW, 1, 2], anchor_wh [1, 1, A, 2]) for one scale.

    grid cell (x, y) ordering matches the reference meshgrid+stack
    (models/slim_yolo_v2.py:91-103): row-major over (y, x) with the last
    dim storing (grid_x, grid_y).
    """
    h, w = input_size
    hs, ws = int(round(h / stride)), int(round(w / stride))
    gy, gx = np.meshgrid(np.arange(hs), np.arange(ws), indexing="ij")
    grid_xy = np.stack([gx, gy], axis=-1).reshape(1, hs * ws, 1, 2)
    anchor_wh = np.asarray(anchor_size, np.float32).reshape(1, 1, -1, 2)
    return (jnp.asarray(grid_xy, jnp.float32), jnp.asarray(anchor_wh))


def split_predictions(pred: jnp.ndarray, num_anchors: int, num_classes: int):
    """Split a flattened head output [B, HW, A*(1+C+4)] into
    (conf [B, HW*A, 1], cls [B, HW*A, C], txtytwth [B, HW, A, 4]).

    Channel layout parity with the reference (models/slim_yolo_v2.py:335-341):
    the first A channels are objectness, the next A*C are class logits
    (anchor-major), the final A*4 are box offsets.
    """
    b, hw, _ = pred.shape
    a, c = num_anchors, num_classes
    conf = pred[:, :, :a].reshape(b, hw * a, 1)
    cls = pred[:, :, a:(1 + c) * a].reshape(b, hw * a, c)
    txtytwth = pred[:, :, (1 + c) * a:].reshape(b, hw, a, 4)
    return conf, cls, txtytwth


def decode_xywh(txtytwth: jnp.ndarray, grid_xy, anchor_wh, stride: int,
                anchor_units: str = "grid"):
    """[B, HW, A, 4] (tx,ty,tw,th) -> [B, HW*A, 4] (cx,cy,w,h) in input px.

    cx,cy = (sigmoid(txty) + grid) * stride.
    With ``anchor_units='grid'`` (v2 family, anchors in grid cells):
    w,h = exp(twth) * anchor * stride (reference models/slim_yolo_v2.py:
    111-124). With ``'pixel'`` (v3 family, anchors already in pixels):
    w,h = exp(twth) * anchor (reference models/yolo_v3.py:97-112).
    """
    b, hw, a, _ = txtytwth.shape
    xy = (jax.nn.sigmoid(txtytwth[..., :2]) + grid_xy) * stride
    wh = jnp.exp(txtytwth[..., 2:]) * anchor_wh
    if anchor_units == "grid":
        wh = wh * stride
    elif anchor_units != "pixel":
        raise ValueError(f"unknown anchor_units {anchor_units!r}")
    return jnp.concatenate([xy, wh], axis=-1).reshape(b, hw * a, 4)


def decode_boxes(txtytwth: jnp.ndarray, grid_xy, anchor_wh, stride: int,
                 anchor_units: str = "grid"):
    """Decode to corner boxes [B, HW*A, 4] = (x1, y1, x2, y2) in input px
    (reference models/slim_yolo_v2.py:126-143)."""
    xywh = decode_xywh(txtytwth, grid_xy, anchor_wh, stride, anchor_units)
    cxcy, wh = xywh[..., :2], xywh[..., 2:]
    return jnp.concatenate([cxcy - wh * 0.5, cxcy + wh * 0.5], axis=-1)
