"""Recorded training-throughput benchmark (VERDICT r3 next #4).

Serving has a machine-recorded headline (bench.py -> BENCH_rNN.json);
this gives training the same: device-bound (pre-staged synthetic input)
train-step img/s for the flagship configs, plus one loader-bound
end-to-end row, written to BENCH_TRAIN.json at the repo root.

Reference analogue: the reference's train loop (train.py:252-322) — it
records no throughput at all, so these numbers define the training
baseline rather than chase one.

Run on TPU:  python scripts/bench_train.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import numpy as np

from yolo_tpu.config import get_config
from yolo_tpu.detector import Detector
from yolo_tpu.train.targets import build_targets
from yolo_tpu.train.trainer import TrainConfig, make_train_step

# fwd GFLOPs per image at 416² (cli/info.py XLA cost analysis); training
# step ~= 3x fwd (fwd + 2 contractions in bwd).
_GFLOPS_416 = {"slim_yolo_v2": 4.93, "yolo_v2": 29.4, "tiny_yolo_v3": 5.5,
               "yolo_v3": 65.6, "yolo_v3_spp": 66.2}
_BF16_PEAK_TFLOPS = 197.0


def synth_targets(rng, batch):
    out = []
    for _ in range(batch):
        xy1 = rng.random((2, 2)) * 0.6
        wh = rng.random((2, 2)) * 0.3 + 0.05
        cls = rng.integers(0, 2, (2, 1))
        out.append(np.concatenate([xy1, xy1 + wh, cls], 1
                                  ).astype(np.float32))
    return out


def device_step_rate(version: str, batch: int, size: int, bf16: bool,
                     iters: int = 20):
    """img/s of the jitted train step with device-resident inputs."""
    cfg = get_config(version, "mask", input_size=(size, size))
    det = Detector(cfg)
    tc = TrainConfig(compute_dtype="bfloat16" if bf16 else None)
    params = det.init_params(jax.random.PRNGKey(0))
    opt, step = make_train_step(det.module, cfg, tc)
    opt_state = opt.init(params)

    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.random((batch, size, size, 3), dtype=np.float32))
    gt = jax.device_put(build_targets(cfg, synth_targets(rng, batch)))
    for _ in range(3):
        params, opt_state, metrics = step(params, opt_state, images,
                                          gt, 1e-4)
    jax.device_get(metrics["total_loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, metrics = step(params, opt_state, images,
                                          gt, 1e-4)
    jax.device_get(metrics["total_loss"])
    dt = (time.perf_counter() - t0) / iters
    gf = _GFLOPS_416.get(version, 0.0) * (size / 416) ** 2
    tflops = 3 * gf * batch / dt / 1e3
    return batch / dt, dt * 1e3, tflops


def e2e_rate(version: str, batch: int, size: int, bf16: bool,
             batches: int = 12):
    """img/s of the full loop: loader (auto workers, u8 frames + native
    augmentation) -> prefetch -> GT assignment -> device step. Host-CPU
    bound on a 1-core harness; recorded for honesty."""
    from yolo_tpu.data.loader import BatchLoader, prefetch_iter
    from yolo_tpu.data.synthetic import SyntheticDetection
    from yolo_tpu.data.transforms import SSDAugmentation

    cfg = get_config(version, "mask", input_size=(size, size))
    det = Detector(cfg)
    tc = TrainConfig(compute_dtype="bfloat16" if bf16 else None)
    params = det.init_params(jax.random.PRNGKey(0))
    opt, step = make_train_step(det.module, cfg, tc)
    opt_state = opt.init(params)

    ds = SyntheticDetection(
        size=(size, size), num_classes=2,
        transform=SSDAugmentation((size, size), normalize=False),
        length=batches * batch)
    loader = BatchLoader(ds, batch, num_workers=8, workers="auto")

    def prepare(b):
        imgs, tgts = b
        return (jax.device_put(imgs),
                jax.device_put(build_targets(cfg, tgts)))

    # warm the compile on the first batch outside the timed region
    it = prefetch_iter(loader, prepare, depth=2)
    imgs0, gt0 = next(it)
    params, opt_state, m = step(params, opt_state, imgs0, gt0, 1e-4)
    jax.device_get(m["total_loss"])
    n, t0 = 0, time.perf_counter()
    for imgs_b, g in it:
        params, opt_state, m = step(params, opt_state, imgs_b, g, 1e-4)
        n += 1
    jax.device_get(m["total_loss"])
    dt = (time.perf_counter() - t0) / max(n, 1)
    return batch / dt, dt * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_TRAIN.json"))
    a = p.parse_args()

    rows = []
    for version, batch, bf16 in [("slim_yolo_v2", 128, False),
                                 ("slim_yolo_v2", 128, True),
                                 ("yolo_v3", 32, True)]:
        ips, ms, tflops = device_step_rate(version, batch, 416, bf16,
                                           a.iters)
        mfu = 100 * tflops / _BF16_PEAK_TFLOPS
        row = {"metric": f"train img/s device-bound ({version} "
                         f"{'bf16' if bf16 else 'fp32'} @416² b{batch})",
               "value": round(ips, 1), "unit": "images/sec",
               "ms_per_step": round(ms, 2),
               "tflops": round(tflops, 1),
               "mfu_vs_bf16_peak_pct": round(mfu, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    ips, ms = e2e_rate("slim_yolo_v2", 128, 416, True)
    row = {"metric": "train img/s end-to-end (slim_yolo_v2 bf16 @416² "
                     "b128, loader+augment+GT+H2D; host-CPU bound on a "
                     "1-core harness)",
           "value": round(ips, 1), "unit": "images/sec",
           "ms_per_step": round(ms, 2)}
    rows.append(row)
    print(json.dumps(row), flush=True)

    with open(a.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
