"""SlimYOLOv2 — the 9-conv FPGA deployment network, TPU-native.

Topology parity with the reference (models/slim_yolo_v2.py:385-422):
9 Conv+BN+LeakyReLU(0.125) 3x3 blocks (16-32-64-64-128-128-256-256-256)
with 4 interleaved 2x2 max pools (stride 16 overall) and a biased 3x3
prediction conv to A*(1+4+C) channels.

Two parameter forms share this module:
- ``batch_norm=True``  → the FP32 training form (reference SlimYOLOv2).
- ``batch_norm=False`` → the BN-fused form with conv bias (reference
  SlimYOLOv2_quantize_bnfuse, models/slim_yolo_v2.py:40-89); produced from
  the former by yolo_tpu.quant.bn_fold. Quantization state (activation
  range trackers) lives in a separate pytree, not inside the model params.
"""

from __future__ import annotations

import jax

from yolo_tpu.ops import blocks

STRIDES = (16,)

# (layer_name, c_in, c_out, followed_by_2x2_maxpool)
# This schedule is also what the INT8 pipeline iterates, mirroring the
# 10-layer schedule hardcoded in the reference C engine
# (c_embedding/yolo_forward.c:1194-1262).
CONV_LAYERS = (
    ("conv1", 3, 16, True),
    ("conv2", 16, 32, True),
    ("conv3_1", 32, 64, False),
    ("conv3_2", 64, 64, True),
    ("conv4_1", 64, 128, False),
    ("conv4_2", 128, 128, True),
    ("conv5", 128, 256, False),
    ("conv6", 256, 256, False),
    ("conv7", 256, 256, False),
)


def layer_names(include_pred: bool = True):
    names = [name for name, _, _, _ in CONV_LAYERS]
    return names + ["pred"] if include_pred else names


def init_params(rng, cfg, batch_norm: bool = True, dtype=None):
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    params = {}
    keys = jax.random.split(rng, len(CONV_LAYERS) + 1)
    for key, (name, c_in, c_out, _) in zip(keys, CONV_LAYERS):
        params[name] = blocks.init_conv_block(
            key, 3, c_in, c_out, batch_norm=batch_norm, dtype=dtype)
    pred_out = cfg.anchors_per_scale * (1 + 4 + cfg.num_classes)
    params["pred"] = blocks.init_conv(keys[-1], 3, 256, pred_out, bias=True,
                                      dtype=dtype)
    return params


def forward(params, x, cfg, train: bool = False):
    """NHWC images -> [head output [B, H/16, W/16, A*(1+C+4)]].

    Matches the reference forward layer order
    (models/slim_yolo_v2.py:549-569).
    """
    new_params = dict(params) if train else None
    out = x
    for name, _, _, pool in CONV_LAYERS:
        if pool:
            # conv+pool pairs route through the dispatcher: identical to
            # conv_block + max_pool unless a blocks.fast_pool_context is
            # active at trace time (then entry layers take the
            # pooled-resolution s2d form).
            if train:
                out, new_layer = blocks.conv_block_pool(
                    params[name], out, train=True)
                new_params[name] = new_layer
            else:
                out = blocks.conv_block_pool(params[name], out)
        elif train:
            out, new_layer = blocks.conv_block(
                params[name], out, padding=1, train=True)
            new_params[name] = new_layer
        else:
            out = blocks.conv_block(params[name], out, padding=1)
    pred = blocks.pred_conv(params["pred"], out, padding=1)
    outputs = [pred]
    if train:
        return outputs, new_params
    return outputs
