"""Device-mesh parallelism.

The reference is strictly single-process / single-GPU (its only
parallelism hook is a commented-out DataParallel, reference train.py:218).
The TPU-native design gets scale from `jax.sharding` over an ICI mesh:

- **data axis**: batch data-parallelism for training and batched
  inference — gradients are reduced by XLA-inserted psums.
- **space axis**: optional spatial partitioning of the image height dim
  for large-resolution inference; XLA's SPMD partitioner inserts the
  conv halo exchanges automatically.

Everything works on any device count, including a CPU-backed virtual
mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N) for tests.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, space: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a ('data', 'space') mesh. Defaults to all devices on the
    data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // space
    if data * space != n:
        raise ValueError(f"mesh {data}x{space} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, space)
    return Mesh(dev_array, ("data", "space"))


def batch_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """Sharding for batches: dim 0 over 'data'; for NHWC images with
    ``spatial=True`` also H over 'space'. The bare P('data') spec applies
    to any rank >= 1 (trailing dims replicate)."""
    spec = P("data", "space", None, None) if spatial else P("data")
    return NamedSharding(mesh, spec)


def replicate(mesh: Mesh):
    """Fully-replicated sharding (for params / small arrays)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, spatial: bool = False):
    """Place a host numpy batch onto the mesh with batch-dim sharding."""
    sh = batch_sharding(mesh, spatial=spatial)
    return jax.device_put(batch, sh)


def shard_params(mesh: Mesh, params):
    return jax.device_put(params, replicate(mesh))
