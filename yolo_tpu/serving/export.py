"""Serialized serving artifacts: export a compiled detector to one
self-contained blob and reload it without any model code.

This is the TPU-native analogue of the reference's deployment artifact:
its pipeline ends with weights frozen into ``weight.h`` and a fixed
compiled engine flashed onto the device (c_embedding/yolo_forward.c —
the graph IS the artifact). Here the jitted detect function (int8
weights, shift tables, decode grid and NMS all baked in as constants)
exports to StableHLO via ``jax.export`` and serializes to bytes: a
serving process deserializes and calls it without constructing models,
quantization pipelines, or configs — and without retracing Python.

The artifact is shape- and platform-explicit: it serves exactly the
batch/resolution it was exported for (serving batches are fixed-shape
by design — the same contract as the reference engine's hardcoded
320x240 schedule), on the platform(s) requested at export time.

Typical flow::

    fn = make_int8_detect_fn(m, cfg, input_s2d=True)
    blob = export_detect(fn, example_input)      # or save_artifact(...)
    ...
    serve = load_artifact(blob)                  # no yolo_tpu needed
    boxes, scores, classes, valid = serve(x)
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import numpy as np
from jax import export as _jex


def export_detect(detect_fn, example_input,
                  platforms: Optional[Sequence[str]] = None) -> bytes:
    """Export a (jitted or plain) detect callable closed over its
    weights to a serialized, self-contained artifact.

    Args:
      detect_fn: callable taking one array (images / int8 / s2d layout).
        Weights must be captured constants (the make_*_detect_fn
        contract) — they are serialized into the artifact.
      example_input: array or ShapeDtypeStruct fixing the input
        shape/dtype (values are ignored).
      platforms: lowering platforms, e.g. ("tpu",), ("cpu",) or both.
        Default: the current default backend.

    Returns: the serialized artifact bytes.
    """
    if isinstance(example_input, jax.ShapeDtypeStruct):
        spec = example_input
    else:
        a = np.asarray(example_input)
        spec = jax.ShapeDtypeStruct(a.shape, a.dtype)
    fn = detect_fn if hasattr(detect_fn, "lower") else jax.jit(detect_fn)
    exported = _jex.export(fn, platforms=platforms)(spec)
    return bytes(exported.serialize())


def load_artifact(blob: Union[bytes, str]):
    """Deserialize an exported detector into a jitted callable.

    ``blob``: the bytes from export_detect/save_artifact, or a path.
    The returned callable runs under jit (compiled on first call,
    cached after) and needs no model/config/weight construction."""
    if isinstance(blob, str):
        with open(blob, "rb") as f:
            blob = f.read()
    exported = _jex.deserialize(bytearray(blob))
    return jax.jit(exported.call)


def save_artifact(detect_fn, example_input, path: str,
                  platforms: Optional[Sequence[str]] = None) -> str:
    """export_detect + write to ``path``. Returns ``path``."""
    blob = export_detect(detect_fn, example_input, platforms)
    with open(path, "wb") as f:
        f.write(blob)
    return path
