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

import os as _os


def _enable_compile_cache():
    """Persistent XLA compilation cache (opt-out via
    YOLO_TPU_NO_COMPILE_CACHE=1). The big int8 serving graphs compile in
    1-2.5 min each on TPU; the cache makes every repeat run (benches,
    CLIs, notebooks) start warm."""
    if _os.environ.get("YOLO_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        path = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache",
                          "yolo_tpu_xla"))
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache even fast compiles; the tunnel round-trip dominates
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compile_cache()

from yolo_tpu.config import (  # noqa: F401,E402
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
