"""Detector facade: wires a model module + config into jitted pipelines.

The reference folds everything into stateful nn.Module forwards with a
dual train/eval mode (models/slim_yolo_v2.py:549-623). Here the pieces are
pure functions composed at trace time:

  images -> model.forward -> split -> decode -> (softmax*sigmoid) -> NMS

all inside one jitted XLA program with static shapes, batched.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.config import DetectorConfig
from yolo_tpu.models import get_model
from yolo_tpu.ops import blocks, decode, nms


def normalize_u8(images: jnp.ndarray) -> jnp.ndarray:
    """uint8 RGB [B, H, W, 3] -> normalized float32, in-graph.

    Same math as the host pipeline (data.transforms: /255, minus mean,
    /std with the reference's BGR stats — data/__init__.py:49-56 —
    applied here in this tensor's RGB channel order), but fused by XLA
    into conv1. Shipping uint8 moves 4x fewer host->device bytes than
    host-normalized float32; pair with
    ``SSDAugmentation(normalize=False)``."""
    from yolo_tpu.config import BGR_MEAN, BGR_STD

    mean = jnp.asarray(BGR_MEAN[::-1], jnp.float32)
    std = jnp.asarray(BGR_STD[::-1], jnp.float32)
    return (images.astype(jnp.float32) / 255.0 - mean) / std


def head_outputs(module, params, x, cfg: DetectorConfig):
    """Run the model and split per-scale head outputs.

    Returns (conf [B, N, 1], cls [B, N, C], txts list of [B, HWs, A, 4])
    where N = sum_s HWs * A, concatenated in STRIDES order — the same
    ordering the GT builder uses (reference tools.py:371-374).
    """
    outs = module.forward(params, x, cfg)
    confs, clss, txts = [], [], []
    a, c = cfg.anchors_per_scale, cfg.num_classes
    for pred in outs:
        flat = blocks.flatten_grid(pred)
        conf_s, cls_s, txt_s = decode.split_predictions(flat, a, c)
        confs.append(conf_s)
        clss.append(cls_s)
        txts.append(txt_s)
    return (jnp.concatenate(confs, axis=1), jnp.concatenate(clss, axis=1),
            txts)


def decode_all_boxes(txts: List[jnp.ndarray], cfg: DetectorConfig):
    """Per-scale anchor decode, concatenated: -> [B, N, 4] corner boxes in
    input pixels."""
    boxes = []
    a = cfg.anchors_per_scale
    for i, (txt, stride) in enumerate(zip(txts, cfg.strides)):
        anchors = cfg.anchor_size[i * a:(i + 1) * a]
        grid_xy, anchor_wh = decode.make_grid(cfg.input_size, stride, anchors)
        boxes.append(decode.decode_boxes(txt, grid_xy, anchor_wh, stride,
                                         cfg.anchor_units))
    return jnp.concatenate(boxes, axis=1)


def predict(module, params, x, cfg: DetectorConfig):
    """images [B, H, W, 3] -> (boxes_norm [B, N, 4] in [0, 1],
    class_probs [B, N, C]).

    Mirrors the reference eval-mode tail (models/slim_yolo_v2.py:344-356):
    sigmoid objectness, box decode / input scale clamped to [0, 1],
    softmax class probs scaled by objectness — but batched and in-graph.
    """
    conf, cls, txts = head_outputs(module, params, x, cfg)
    # decode/scoring in f32 regardless of the backbone compute dtype
    conf = conf.astype(jnp.float32)
    cls = cls.astype(jnp.float32)
    txts = [t.astype(jnp.float32) for t in txts]
    h, w = cfg.input_size
    scale = jnp.asarray([w, h, w, h], jnp.float32)
    boxes = jnp.clip(decode_all_boxes(txts, cfg) / scale, 0.0, 1.0)
    probs = jax.nn.softmax(cls, axis=-1) * jax.nn.sigmoid(conf)
    return boxes, probs


def train_outputs(module, params, x, cfg: DetectorConfig):
    """Training forward: returns ((conf, cls, txtytwth_flat, boxes_norm),
    new_params). ``boxes_norm`` is the decoded (stop-gradient) box used as
    the IoU objectness target (reference models/slim_yolo_v2.py:601-612)."""
    outs, new_params = module.forward(params, x, cfg, train=True)
    confs, clss, txts = [], [], []
    a, c = cfg.anchors_per_scale, cfg.num_classes
    for pred in outs:
        flat = blocks.flatten_grid(pred)
        conf_s, cls_s, txt_s = decode.split_predictions(flat, a, c)
        confs.append(conf_s)
        clss.append(cls_s)
        txts.append(txt_s)
    conf = jnp.concatenate(confs, axis=1)
    cls = jnp.concatenate(clss, axis=1)
    h, w = cfg.input_size
    scale = jnp.asarray([w, h, w, h], jnp.float32)
    boxes_norm = jax.lax.stop_gradient(decode_all_boxes(txts, cfg) / scale)
    txt_flat = jnp.concatenate(
        [t.reshape(t.shape[0], -1, 4) for t in txts], axis=1)
    return (conf, cls, txt_flat, boxes_norm), new_params


class Detector:
    """Convenience wrapper holding (module, cfg) with jitted entry points.

    ``dtype=jnp.bfloat16`` serves the model in bf16 (params + activations
    on the MXU's fast path); decode/NMS stay f32. Default f32 keeps exact
    reference-parity numerics."""

    def __init__(self, cfg: DetectorConfig, batch_norm: bool = True,
                 dtype=None):
        self.cfg = cfg
        self.module = get_model(cfg.name)
        self.batch_norm = batch_norm
        self.dtype = dtype
        self._detect_jit = jax.jit(self._detect)
        self._predict_jit = jax.jit(self._predict)

    def init_params(self, rng):
        return self.module.init_params(rng, self.cfg,
                                       batch_norm=self.batch_norm,
                                       dtype=self.dtype)

    def cast_params(self, params):
        """Cast an existing param pytree to this detector's dtype."""
        if self.dtype is None:
            return params
        return jax.tree_util.tree_map(
            lambda t: t.astype(self.dtype), params)

    # -- jittable bodies ----------------------------------------------------

    def _predict(self, params, images):
        from yolo_tpu.quant.fixed_point import check_serving_input
        check_serving_input(images, self.cfg)
        if images.dtype == jnp.uint8:
            # raw RGB bytes: normalize in-graph (4x less H2D traffic)
            images = normalize_u8(images)
        if self.dtype is not None:
            images = images.astype(self.dtype)
        return predict(self.module, params, images, self.cfg)

    def _detect(self, params, images):
        boxes, probs = self._predict(params, images)
        return nms.batched_postprocess(
            boxes, probs, self.cfg.conf_thresh, self.cfg.nms_thresh,
            self.cfg.pre_nms_top_k, self.cfg.top_k)

    # -- public API ----------------------------------------------------------

    def detect(self, params, images):
        """Batched in-graph detection: [B, H, W, 3] ->
        (boxes [B, K, 4] normalized, scores [B, K], classes [B, K],
        valid [B, K])."""
        return self._detect_jit(params, images)

    def predict(self, params, images):
        return self._predict_jit(params, images)

    def detect_single_numpy(self, params, image):
        """Reference-parity single-image path: device predict + the exact
        numpy postprocess of the reference (variable-length outputs).
        image: [H, W, 3] normalized NHWC."""
        boxes, probs = self._predict_jit(params, image[None])
        return nms.postprocess_numpy(
            np.asarray(boxes[0]), np.asarray(probs[0]),
            self.cfg.num_classes, self.cfg.conf_thresh, self.cfg.nms_thresh)


def build_detector(model: str = "slim_yolo_v2", dataset: str = "mask",
                   **kwargs) -> Detector:
    from yolo_tpu.config import get_config

    cfg = get_config(model, dataset, **kwargs)
    return Detector(cfg, batch_norm=not model.endswith("_q_bf"))
