"""Model registry.

Every model module exposes the uniform functional API:

- ``STRIDES``: tuple of detection strides (fine -> coarse).
- ``init_params(rng, cfg, batch_norm=True) -> params`` pytree.
- ``forward(params, x, cfg, train=False)``: NHWC images -> list of
  per-scale head outputs ``[B, Hs, Ws, A*(1+C+4)]`` (one per stride, in
  STRIDES order). With ``train=True`` returns ``(outputs, new_params)``
  (BatchNorm running stats are carried functionally).

The detector facade (yolo_tpu.detector) builds jitted detect/loss
pipelines on top of this API.
"""

from yolo_tpu.models import slim_yolo_v2  # noqa: F401


def get_model(name: str):
    """Resolve a model module by reference version name
    (the -v flag dispatch, reference train.py:174-213)."""
    from yolo_tpu.models import (
        tiny_yolo_v3, yolo_v2, yolo_v3, yolo_v3_spp)

    registry = {
        "slim_yolo_v2": slim_yolo_v2,
        "slim_yolo_v2_q_bf": slim_yolo_v2,  # same topology, BN pre-folded
        "yolo_v2": yolo_v2,
        "yolo_v3": yolo_v3,
        "yolo_v3_spp": yolo_v3_spp,
        "tiny_yolo_v3": tiny_yolo_v3,
    }
    if name not in registry:
        raise ValueError(f"unknown model {name!r}")
    return registry[name]
