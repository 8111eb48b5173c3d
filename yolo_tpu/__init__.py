"""yolo_tpu — TPU-native YOLO compression & deployment framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
ZLkanyo009/Yolo-compression-and-deployment-in-FPGA:

- YOLO detector family (slim_yolo_v2, yolo_v2, yolo_v3, yolo_v3_spp,
  tiny_yolo_v3) as pure functions over parameter pytrees (NHWC layout).
- Full compression toolchain as *functional weight/graph transforms*:
  BN folding, low-LR retune, post-training INT8 quantization with
  power-of-two scales, and per-layer accumulator-overflow "retune shift"
  search (the FPGA int16-accumulator model).
- An int8 fixed-point inference graph (XLA + Pallas kernels) that is
  bit-comparable with the integer semantics of the reference's embedded
  C engine (c_embedding/yolo_forward.c).
- In-graph decode + fixed-shape NMS so whole-batch detection runs as a
  single jitted XLA program.
- Data-parallel / spatially-sharded execution over a jax.sharding.Mesh.
"""

__version__ = "0.1.0"

from yolo_tpu.config import (  # noqa: F401
    ANCHOR_SIZE,
    ANCHOR_SIZE_COCO,
    ANCHOR_SIZE_MASK,
    IGNORE_THRESH,
    MULTI_ANCHOR_SIZE,
    MULTI_ANCHOR_SIZE_COCO,
    TINY_MULTI_ANCHOR_SIZE,
    TINY_MULTI_ANCHOR_SIZE_COCO,
    TRAIN_CFG,
    DetectorConfig,
    get_config,
)
