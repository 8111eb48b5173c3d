"""Training-step time attribution on one chip.

Where a train iteration's wall time goes: the jitted device step vs the
host-side pieces (data loading + augmentation, GT assignment, multi-scale
resize). Companion to scripts/profile_int8.py (serving side); methodology
notes in docs/PERFORMANCE.md — device timings synchronize through
jax.device_get of a scalar.

Run on TPU:
  python scripts/profile_train.py --version slim_yolo_v2 --batch 128 --bf16
"""

from __future__ import annotations

import argparse
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
# step ~= 3x fwd (fwd + 2x in bwd). bf16 peak ~197 TFLOPS on v5e.
_GFLOPS_416 = {"slim_yolo_v2": 4.93, "yolo_v2": 29.4, "tiny_yolo_v3": 5.5,
               "yolo_v3": 65.6, "yolo_v3_spp": 66.2}
_BF16_PEAK_TFLOPS = 197.0
_F32_PEAK_TFLOPS = 49.0  # v5e fp32 (no native f32 MXU mode; XLA uses
# bf16x3 passes or the VPU — treat as reference only)


def synth_targets(rng, batch):
    """Random normalized [N,5] target lists (2 boxes per image)."""
    out = []
    for _ in range(batch):
        xy1 = rng.random((2, 2)) * 0.6
        wh = rng.random((2, 2)) * 0.3 + 0.05
        cls = rng.integers(0, 2, (2, 1))
        out.append(np.concatenate([xy1, xy1 + wh, cls], 1
                                  ).astype(np.float32))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--version", default="slim_yolo_v2")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--size", type=int, default=416)
    p.add_argument("--bf16", action="store_true", default=False)
    p.add_argument("--remat", action="store_true", default=False)
    p.add_argument("--iters", type=int, default=20)
    a = p.parse_args()

    cfg = get_config(a.version, "mask", input_size=(a.size, a.size))
    det = Detector(cfg)
    tc = TrainConfig(compute_dtype="bfloat16" if a.bf16 else None,
                     remat=a.remat)
    params = det.init_params(jax.random.PRNGKey(0))
    opt, step = make_train_step(det.module, cfg, tc)
    opt_state = opt.init(params)

    rng = np.random.default_rng(0)
    images = rng.random((a.batch, a.size, a.size, 3), dtype=np.float32)
    targets = synth_targets(rng, a.batch)
    gt = build_targets(cfg, targets)

    # -- pure device step (inputs resident, donated params) -------------
    imgs_d, gt_d = jax.device_put(images), jax.device_put(gt)
    for _ in range(3):
        params, opt_state, metrics = step(params, opt_state, imgs_d,
                                          gt_d, 1e-4)
    jax.device_get(metrics["total_loss"])
    t0 = time.perf_counter()
    for _ in range(a.iters):
        params, opt_state, metrics = step(params, opt_state, imgs_d,
                                          gt_d, 1e-4)
    jax.device_get(metrics["total_loss"])
    dt_step = (time.perf_counter() - t0) / a.iters

    # -- device step fed from host numpy (includes H2D transfer) --------
    t0 = time.perf_counter()
    for _ in range(a.iters):
        params, opt_state, metrics = step(params, opt_state, images,
                                          gt, 1e-4)
    jax.device_get(metrics["total_loss"])
    dt_step_h = (time.perf_counter() - t0) / a.iters

    # -- host: GT assignment --------------------------------------------
    t0 = time.perf_counter()
    for _ in range(a.iters):
        build_targets(cfg, targets)
    dt_gt = (time.perf_counter() - t0) / a.iters

    # -- host: loader (synthetic decode + SSD augmentation) -------------
    from yolo_tpu.data.loader import BatchLoader, prefetch_iter
    from yolo_tpu.data.synthetic import SyntheticDetection
    from yolo_tpu.data.transforms import SSDAugmentation

    def make_loader(workers, u8):
        ds = SyntheticDetection(
            size=(a.size, a.size), num_classes=2,
            transform=SSDAugmentation((a.size, a.size),
                                      normalize=not u8),
            length=4 * a.batch)
        return BatchLoader(ds, a.batch, num_workers=8, workers=workers)

    def time_loader(loader):
        n, t0 = 0, time.perf_counter()
        for _imgs, _tgts in loader:
            n += 1
        return (time.perf_counter() - t0) / max(n, 1)

    dt_load = time_loader(make_loader("thread", u8=False))
    dt_load_p = time_loader(make_loader("process", u8=False))
    dt_load_pu8 = time_loader(make_loader("process", u8=True))
    dt_load_auto = time_loader(make_loader("auto", u8=True))

    # -- end-to-end loops ------------------------------------------------
    def run_e2e(loader, prefetch, p, o):
        def prepare(batch):
            imgs_b, tgts_b = batch
            return (jax.device_put(imgs_b),
                    jax.device_put(build_targets(cfg, tgts_b)))

        it = (prefetch_iter(loader, prepare, depth=2) if prefetch
              else map(prepare, iter(loader)))
        n, t0 = 0, time.perf_counter()
        m = None
        for imgs_b, g in it:
            p, o, m = step(p, o, imgs_b, g, 1e-4)
            n += 1
        jax.device_get(m["total_loss"])
        return (time.perf_counter() - t0) / max(n, 1), p, o

    dt_e2e, params, opt_state = run_e2e(
        make_loader("thread", u8=False), False, params, opt_state)
    dt_e2e_new, params, opt_state = run_e2e(
        make_loader("auto", u8=True), True, params, opt_state)

    gf = _GFLOPS_416.get(a.version, 0.0) * (a.size / 416) ** 2
    tflops = 3 * gf * a.batch / dt_step / 1e3
    peak = _BF16_PEAK_TFLOPS if a.bf16 else _F32_PEAK_TFLOPS
    mode = "bf16" if a.bf16 else "fp32"
    print(f"\n{a.version} {mode} @{a.size}² b{a.batch} (iters={a.iters})")
    print(f"  device step (resident inputs): {dt_step*1e3:8.2f} ms  "
          f"{a.batch/dt_step:7.0f} img/s  ~{tflops:.1f} TFLOPS "
          f"(~{100*tflops/peak:.0f}% of {mode} peak)")
    print(f"  step + H2D transfer:           {dt_step_h*1e3:8.2f} ms  "
          f"(+{(dt_step_h-dt_step)*1e3:.2f} ms)")
    print(f"  host GT assignment:            {dt_gt*1e3:8.2f} ms")
    print(f"  host loader (8 threads, f32):  {dt_load*1e3:8.2f} ms")
    print(f"  host loader (8 procs, f32):    {dt_load_p*1e3:8.2f} ms")
    print(f"  host loader (8 procs, uint8):  {dt_load_pu8*1e3:8.2f} ms")
    print(f"  host loader (auto: native aug):{dt_load_auto*1e3:8.2f} ms")
    print(f"  e2e loop (thread/f32/no-pf):   {dt_e2e*1e3:8.2f} ms  "
          f"{a.batch/dt_e2e:7.0f} img/s  "
          f"(overhead vs step {100*(dt_e2e/dt_step-1):.0f}%)")
    print(f"  e2e loop (auto/uint8/prefetch):{dt_e2e_new*1e3:8.2f} ms  "
          f"{a.batch/dt_e2e_new:7.0f} img/s  "
          f"(overhead vs step {100*(dt_e2e_new/dt_step-1):.0f}%)")


if __name__ == "__main__":
    main()
