"""Checkpointing: msgpack save/load for param pytrees + reference
.pth import.

The reference checkpoints with torch.save(state_dict) every 10 epochs and
stage-suffixed filenames (train.py:357-361, conv+bn2conv.py:342-345).
Here params are msgpack bytes via flax.serialization (framework-neutral,
no pickle), and `load_torch_checkpoint` maps a reference-layout torch
state_dict onto our pytrees so published .pth files keep working.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, params, extra: Optional[dict] = None) -> None:
    payload = {"params": jax.device_get(params)}
    if extra:
        payload["extra"] = jax.device_get(extra)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def load_checkpoint(path: str):
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return payload["params"], payload.get("extra")


# ---------------------------------------------------------------------------
# Orbax backend (production / multi-host checkpoints).
# ---------------------------------------------------------------------------
#
# msgpack (above) is the simple single-host format; orbax writes each
# array as a separate (optionally sharded) record, so on a multi-host
# DCN job every process saves only its addressable shards and restore
# can re-shard directly onto a mesh. Directory-per-checkpoint layout.


def save_checkpoint_orbax(path: str, params, extra: Optional[dict] = None
                          ) -> None:
    """Save a pytree (plus a small ``extra`` metadata tree) as an orbax
    checkpoint directory. Works with sharded jax.Arrays on any mesh and
    with multi-process (DCN) jobs."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    payload = {"params": params}
    if extra:
        payload["extra"] = extra
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)


def load_checkpoint_orbax(path: str, target=None):
    """Restore (params, extra). With ``target`` (a pytree of
    jax.ShapeDtypeStruct or arrays with shardings), arrays restore
    directly into that structure/sharding; otherwise host numpy."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is not None:
            payload = ckptr.restore(
                path, args=ocp.args.PyTreeRestore(
                    {"params": target, "extra": None}))
        else:
            payload = ckptr.restore(path)
    return payload["params"], payload.get("extra")


# ---------------------------------------------------------------------------
# Torch .pth import (reference checkpoint compatibility).
# ---------------------------------------------------------------------------


def _read_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint into numpy arrays. Uses torch if present
    (CPU), since it's baked into this image; keeps the dependency local
    to this function."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}


def _conv_w(t: np.ndarray) -> np.ndarray:
    """OIHW (torch) -> HWIO (ours)."""
    return np.transpose(t, (2, 3, 1, 0))


def _map_conv_block(sd: Dict[str, np.ndarray], prefix: str,
                    has_bn: bool) -> dict:
    """Map a reference Conv2d/Conv2d_fuse block (utils/modules.py:6-29):
    '<prefix>.convs.0' is the conv, '.convs.1' the BN when present."""
    out = {"w": _conv_w(sd[f"{prefix}.convs.0.weight"])}
    if f"{prefix}.convs.0.bias" in sd:
        out["b"] = sd[f"{prefix}.convs.0.bias"]
    if has_bn:
        out["bn"] = {
            "gamma": sd[f"{prefix}.convs.1.weight"],
            "beta": sd[f"{prefix}.convs.1.bias"],
            "mean": sd[f"{prefix}.convs.1.running_mean"],
            "var": sd[f"{prefix}.convs.1.running_var"],
        }
    return out


def load_torch_slim_yolo_v2(path: str, fused: bool = False):
    """Reference SlimYOLOv2 (.pth) -> our param pytree.

    fused=False: the BN form (reference models/slim_yolo_v2.py:385-422,
    keys like 'conv1.convs.{0,1}.*').
    fused=True: the BN-folded form saved by the conv+bn2conv pass /
    retune scripts (SlimYOLOv2_quantize_bnfuse layout, biased convs).

    Returns (params, tracker_scales) where tracker_scales maps tracker
    name -> EMA scale (empty for non-quantized checkpoints).
    """
    from yolo_tpu.models.slim_yolo_v2 import CONV_LAYERS

    sd = _read_torch_state_dict(path)
    params = {}
    for name, _, _, _ in CONV_LAYERS:
        params[name] = _map_conv_block(sd, name, has_bn=not fused)
    params["pred"] = {"w": _conv_w(sd["pred.weight"]), "b": sd["pred.bias"]}

    trackers = {}
    tracker_map = {"a_tracker_in": "in", "a_tracker_pred": "pred"}
    for name, _, _, _ in CONV_LAYERS:
        tracker_map[f"a_tracker{name[4:]}"] = name  # conv3_1 -> a_tracker3_1
    for tk, ours in tracker_map.items():
        key = f"{tk}.scale"
        if key in sd:
            trackers[ours] = float(np.asarray(sd[key]).reshape(()))
    return params, trackers


def load_torch_darknet19(path: str):
    """Reference darknet19 ImageNet checkpoint -> backbone pytree
    (backbone/darknet.py:40-108: keys 'conv_N.M.convs.K.*')."""
    from yolo_tpu.models.darknet import _D19_SPECS

    sd = _read_torch_state_dict(path)
    params = {}
    for name, specs in _D19_SPECS.items():
        seq = []
        for j in range(len(specs)):
            seq.append(_map_conv_block(sd, f"{name}.{j}", has_bn=True))
        params[name] = seq
    return params


def load_torch_darknet53(path: str):
    """Reference darknet53 ImageNet checkpoint -> backbone pytree
    (backbone/darknet.py:110-159: 'layer_N.0' entry conv, then resblocks
    as 'layer_N.M.module_list.K.{0,1}')."""
    from yolo_tpu.models.darknet import _D53_LAYERS

    sd = _read_torch_state_dict(path)
    params = {}
    for name, entry, ch, nblocks in _D53_LAYERS:
        seq = [_map_conv_block(sd, f"{name}.{j}", has_bn=True)
               for j in range(len(entry))]
        # resblocks live in one nn.ModuleList module at the next index
        res_base = f"{name}.{len(entry)}.module_list"
        blocks = []
        for k in range(nblocks):
            blocks.append([
                _map_conv_block(sd, f"{res_base}.{k}.0", has_bn=True),
                _map_conv_block(sd, f"{res_base}.{k}.1", has_bn=True),
            ])
        params[name] = {"entry": seq, "blocks": blocks}
    return params


def load_torch_darknet_light(path: str):
    """Reference darknet_light checkpoint -> backbone pytree
    (backbone/darknet.py:211-255: plain 'conv_N.convs.K.*' blocks)."""
    from yolo_tpu.models.darknet import _DLIGHT_SPECS

    sd = _read_torch_state_dict(path)
    return {name: [_map_conv_block(sd, name, has_bn=True)]
            for name in _DLIGHT_SPECS}
