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

import json
import struct
from typing import Optional, Sequence, Union

import jax
import numpy as np
from jax import export as _jex

# Self-describing container: MAGIC + u32 header length + JSON header +
# the jax.export blob. The header carries what a serving process needs
# to FEED the graph (input mode, quantization exponent, batch/size) —
# the weight.h role of the scale tables. Raw blobs (no magic) still
# load for back-compat.
_MAGIC = b"YTPUART1"


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


def load_artifact(blob: Union[bytes, str], with_meta: bool = False):
    """Deserialize an exported detector into a jitted callable.

    ``blob``: the bytes from export_detect/save_artifact, or a path.
    The returned callable runs under jit (compiled on first call,
    cached after) and needs no model/config/weight construction.

    ``with_meta``: also return the artifact's metadata dict (empty for
    raw blobs saved without ``meta``)."""
    if isinstance(blob, str):
        with open(blob, "rb") as f:
            blob = f.read()
    meta = {}
    if blob[:len(_MAGIC)] == _MAGIC:
        (hlen,) = struct.unpack_from("<I", blob, len(_MAGIC))
        ofs = len(_MAGIC) + 4
        meta = json.loads(blob[ofs:ofs + hlen].decode())
        blob = blob[ofs + hlen:]
    exported = _jex.deserialize(bytearray(blob))
    fn = jax.jit(exported.call)
    return (fn, meta) if with_meta else fn


def save_artifact(detect_fn, example_input, path: str,
                  platforms: Optional[Sequence[str]] = None,
                  meta: Optional[dict] = None) -> str:
    """export_detect + write to ``path``. Returns ``path``.

    ``meta``: optional JSON-serializable dict describing how to feed the
    graph (e.g. input mode 's2d'|'int8'|'f32', ``sa_in`` quantization
    exponent, batch, input_size, version) — stored in a self-describing
    container so ``cli.serve --artifact`` can wire the input pipeline
    without any other source of truth. Omitted -> raw blob (loads
    anywhere jax.export does)."""
    blob = export_detect(detect_fn, example_input, platforms)
    with open(path, "wb") as f:
        if meta is not None:
            hdr = json.dumps(meta).encode()
            f.write(_MAGIC + struct.pack("<I", len(hdr)) + hdr)
        f.write(blob)
    return path
