"""Darknet backbone family, functional NHWC.

Topology parity with reference backbone/darknet.py:
- darknet19 (:40-108): 19-conv, returns (C4 s8/256c, C5 s16/512c,
  C6 s32/1024c).
- darknet53 (:110-159): residual, returns (C3 s8/256c, C4 s16/512c,
  C5 s32/1024c).
- darknet_tiny (:161-209): strided convs, returns (C3, C4, C5).
- darknet_light (:211-255): tiny-yolov3 backbone incl. the
  ZeroPad+stride-1 maxpool, returns (C4 s16/256c, C5 s32/1024c).

All blocks are Conv+BN+LeakyReLU(0.1).
"""

from __future__ import annotations

import jax

from yolo_tpu.models.common import cb, init_seq, run_block, run_seq
from yolo_tpu.ops import blocks

SLOPE = blocks.BACKBONE_LEAKY_SLOPE  # 0.1


# ---------------------------------------------------------------------------
# darknet19
# ---------------------------------------------------------------------------

_D19_SPECS = {
    "conv_1": [cb(3, 3, 32, 1, 1)],
    "conv_2": [cb(3, 32, 64, 1, 1)],
    "conv_3": [cb(3, 64, 128, 1, 1), cb(1, 128, 64), cb(3, 64, 128, 1, 1)],
    "conv_4": [cb(3, 128, 256, 1, 1), cb(1, 256, 128), cb(3, 128, 256, 1, 1)],
    "conv_5": [cb(3, 256, 512, 1, 1), cb(1, 512, 256), cb(3, 256, 512, 1, 1),
               cb(1, 512, 256), cb(3, 256, 512, 1, 1)],
    "conv_6": [cb(3, 512, 1024, 1, 1), cb(1, 1024, 512),
               cb(3, 512, 1024, 1, 1), cb(1, 1024, 512),
               cb(3, 512, 1024, 1, 1)],
}


def init_darknet19(rng, dtype=None):
    keys = jax.random.split(rng, len(_D19_SPECS))
    return {name: init_seq(k, specs, dtype=dtype)
            for k, (name, specs) in zip(keys, _D19_SPECS.items())}


def darknet19(params, x, train=False):
    new = {}
    x, new["conv_1"] = run_seq(params["conv_1"], x, _D19_SPECS["conv_1"],
                               train, SLOPE)
    x = blocks.max_pool(x)
    x, new["conv_2"] = run_seq(params["conv_2"], x, _D19_SPECS["conv_2"],
                               train, SLOPE)
    x = blocks.max_pool(x)
    x, new["conv_3"] = run_seq(params["conv_3"], x, _D19_SPECS["conv_3"],
                               train, SLOPE)
    x = blocks.max_pool(x)
    c4, new["conv_4"] = run_seq(params["conv_4"], x, _D19_SPECS["conv_4"],
                                train, SLOPE)
    c5, new["conv_5"] = run_seq(params["conv_5"], blocks.max_pool(c4),
                                _D19_SPECS["conv_5"], train, SLOPE)
    c6, new["conv_6"] = run_seq(params["conv_6"], blocks.max_pool(c5),
                                _D19_SPECS["conv_6"], train, SLOPE)
    return (c4, c5, c6), new


# ---------------------------------------------------------------------------
# darknet53
# ---------------------------------------------------------------------------

_D53_LAYERS = (
    # (name, entry spec, res channels, nblocks)
    ("layer_1", [cb(3, 3, 32, 1, 1), cb(3, 32, 64, 2, 1)], 64, 1),
    ("layer_2", [cb(3, 64, 128, 2, 1)], 128, 2),
    ("layer_3", [cb(3, 128, 256, 2, 1)], 256, 8),
    ("layer_4", [cb(3, 256, 512, 2, 1)], 512, 8),
    ("layer_5", [cb(3, 512, 1024, 2, 1)], 1024, 4),
)


def _res_specs(ch):
    return [cb(1, ch, ch // 2), cb(3, ch // 2, ch, 1, 1)]


def init_darknet53(rng, dtype=None):
    params = {}
    keys = jax.random.split(rng, len(_D53_LAYERS))
    for key, (name, entry, ch, nblocks) in zip(keys, _D53_LAYERS):
        bkeys = jax.random.split(key, nblocks + 1)
        params[name] = {
            "entry": init_seq(bkeys[0], entry, dtype=dtype),
            "blocks": [init_seq(bk, _res_specs(ch), dtype=dtype)
                       for bk in bkeys[1:]],
        }
    return params


def darknet53(params, x, train=False):
    new = {}
    feats = []
    for name, entry, ch, nblocks in _D53_LAYERS:
        layer = params[name]
        x, new_entry = run_seq(layer["entry"], x, entry, train, SLOPE)
        new_blocks = []
        for bp in layer["blocks"]:
            y, nb = run_seq(bp, x, _res_specs(ch), train, SLOPE)
            # residual (reference backbone/darknet.py:35-38); tapped
            # under a quantization context
            x = blocks.residual_add(y, x)
            new_blocks.append(nb)
        new[name] = {"entry": new_entry, "blocks": new_blocks}
        feats.append(x)
    # C3 (s8), C4 (s16), C5 (s32)
    return (feats[2], feats[3], feats[4]), new


# ---------------------------------------------------------------------------
# darknet_tiny
# ---------------------------------------------------------------------------

_DTINY_SPECS = {
    "conv_1": [cb(3, 3, 32, 1, 1), cb(3, 32, 32, 2, 1)],
    "conv_2": [cb(3, 32, 64, 1, 1), cb(3, 64, 64, 2, 1)],
    "conv_3": [cb(3, 64, 128, 1, 1), cb(3, 128, 128, 2, 1)],
    "conv_4": [cb(3, 128, 256, 1, 1), cb(3, 256, 256, 2, 1)],
    "conv_5": [cb(3, 256, 512, 1, 1), cb(3, 512, 512, 2, 1)],
}


def init_darknet_tiny(rng, dtype=None):
    keys = jax.random.split(rng, len(_DTINY_SPECS))
    return {name: init_seq(k, specs, dtype=dtype)
            for k, (name, specs) in zip(keys, _DTINY_SPECS.items())}


def darknet_tiny(params, x, train=False):
    new = {}
    feats = {}
    for name, specs in _DTINY_SPECS.items():
        x, new[name] = run_seq(params[name], x, specs, train, SLOPE)
        feats[name] = x
    return (feats["conv_3"], feats["conv_4"], feats["conv_5"]), new


# ---------------------------------------------------------------------------
# darknet_light (tiny-yolov3 backbone)
# ---------------------------------------------------------------------------

_DLIGHT_SPECS = {
    "conv_1": [cb(3, 3, 16, 1, 1)],
    "conv_2": [cb(3, 16, 32, 1, 1)],
    "conv_3": [cb(3, 32, 64, 1, 1)],
    "conv_4": [cb(3, 64, 128, 1, 1)],
    "conv_5": [cb(3, 128, 256, 1, 1)],
    "conv_6": [cb(3, 256, 512, 1, 1)],
    "conv_7": [cb(3, 512, 1024, 1, 1)],
}


def init_darknet_light(rng, dtype=None):
    keys = jax.random.split(rng, len(_DLIGHT_SPECS))
    return {name: init_seq(k, specs, dtype=dtype)
            for k, (name, specs) in zip(keys, _DLIGHT_SPECS.items())}


def darknet_light(params, x, train=False):
    new = {}

    def seq(name, x):
        y, new[name] = run_seq(params[name], x, _DLIGHT_SPECS[name], train,
                               SLOPE)
        return y

    x = blocks.max_pool(seq("conv_1", x))
    x = blocks.max_pool(seq("conv_2", x))
    x = blocks.max_pool(seq("conv_3", x))
    x = blocks.max_pool(seq("conv_4", x))
    c4 = seq("conv_5", x)                      # stride 16
    x = blocks.max_pool(c4)
    x = seq("conv_6", x)
    x = blocks.zero_pad_maxpool_s1(x)          # darknet.py:232-235
    c5 = seq("conv_7", x)                      # stride 32
    return (c4, c5), new
