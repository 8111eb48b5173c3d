"""Profiling / metrics utilities.

The reference's observability is wall-clock prints around forwards
(test.py:82-85) plus a thop FLOPs counter (utils/com_paras_flops.py) and
optional TensorBoard loss scalars (train.py:223-230). TPU-native
equivalents:

- ``trace``: context manager around jax.profiler for XLA/TPU traces
  viewable in TensorBoard/Perfetto.
- ``ThroughputMeter``: images/sec with device synchronization.
- ``MetricsLogger``: JSONL scalars (loss terms, LR, mAP) — greppable and
  TensorBoard-convertible.
- ``count_flops``: analytic cost of a jitted fn via XLA's cost analysis
  (replaces the broken thop wrapper, utils/com_paras_flops.py:3).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str = "/tmp/yolo_tpu_trace"):
    """Capture a device profile: ``with trace('/tmp/t'): fn()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Images/sec over a sliding window; sync via device_get of outputs
    (block_until_ready is unreliable under the axon tunnel)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._images = 0

    def update(self, batch_size: int, outputs=None):
        if outputs is not None:
            jax.device_get(outputs)
        self._images += batch_size

    @property
    def images_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._images / max(dt, 1e-9)


class MetricsLogger:
    """Append-only JSONL scalar log."""

    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self.path = path
        self.echo = echo
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a")
        else:
            self._f = None

    def log(self, step: int, **scalars):
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()
        if self.echo:
            body = " ".join(f"{k}={v:.4g}" for k, v in scalars.items())
            print(f"[step {step}] {body}")

    def close(self):
        if self._f:
            self._f.close()


def count_flops(fn, *args) -> dict:
    """Analytic FLOPs/bytes of a jittable fn via XLA cost analysis."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    return {
        "flops": cost.get("flops", float("nan")),
        "bytes accessed": cost.get("bytes accessed", float("nan")),
    }


def count_params(params) -> int:
    return int(sum(np.prod(p.shape)
                   for p in jax.tree_util.tree_leaves(params)))
