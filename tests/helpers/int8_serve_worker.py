"""Worker for the multi-host INT8 SERVING test: one process of an
N-process CPU cluster, 4 virtual devices each. Builds the integer
serving engine from deterministic params, runs ONE globally-sharded
detect batch, and writes this host's addressable output rows to disk
(the test stitches hosts together and bit-compares against a
single-process run).

Usage: python int8_serve_worker.py <port> <nproc> <pid> <outdir>
"""

import os
import sys

port, nproc, pid, outdir = (sys.argv[1], int(sys.argv[2]),
                            int(sys.argv[3]), sys.argv[4])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=4")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np  # noqa: E402

from yolo_tpu.parallel import distributed  # noqa: E402

distributed.initialize(f"localhost:{port}", nproc, pid)

import jax  # noqa: E402

assert jax.process_count() == nproc, jax.process_count()

from yolo_tpu.config import get_config  # noqa: E402
from yolo_tpu.detector import Detector  # noqa: E402
from yolo_tpu.quant.int8_graph import (  # noqa: E402
    make_int8_detect_fn, quantize_pipeline)

cfg = get_config("slim_yolo_v2", "mask", input_size=(64, 64),
                 conf_thresh=0.01)
det = Detector(cfg)
params = det.init_params(jax.random.PRNGKey(0))

# every host derives the identical Int8Model locally (deterministic
# params + calibration data; no collective needed)
rng = np.random.default_rng(7)
calib = [rng.random((4, 64, 64, 3), dtype=np.float32) for _ in range(2)]
m = quantize_pipeline(params, cfg, calib)

mesh = distributed.make_global_mesh()
detect = make_int8_detect_fn(m, cfg, mesh=mesh)

# deterministic global batch of 8; this host feeds only its slice
g_images = np.random.default_rng(42).random((8, 64, 64, 3),
                                            dtype=np.float32)
per = 8 // nproc
local = g_images[pid * per:(pid + 1) * per]
images = distributed.host_local_to_global(mesh, local)

out = detect(images)

# persist this host's addressable rows, ordered by global batch index
arrs = {}
for name, a in zip(("boxes", "scores", "classes", "valid"), out):
    shards = sorted(a.addressable_shards, key=lambda s: s.index[0].start)
    arrs[name] = np.concatenate([np.asarray(s.data) for s in shards])
np.savez(os.path.join(outdir, f"serve_p{pid}.npz"), **arrs)
print(f"worker {pid}: OK rows={arrs['boxes'].shape[0]}")
