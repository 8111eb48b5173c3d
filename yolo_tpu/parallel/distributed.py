"""Multi-host (DCN) data parallelism.

The reference is single-process (its only parallelism hook is a
commented-out DataParallel, reference train.py:218). The TPU-native
multi-host story:

- every host runs the same program and calls ``initialize()`` with a
  shared coordinator address (`jax.distributed`);
- the mesh is built over the GLOBAL device list, data axis spanning
  hosts — within a pod slice, gradient psums ride ICI; across slices,
  DCN;
- each host loads only its own shard of every batch
  (``BatchLoader(..., process_id, process_count)``) and assembles the
  global batch with ``host_local_to_global`` — no host ever
  materializes the full batch.

Testable without TPUs: spawn N CPU processes with
``jax.distributed.initialize`` on localhost (see
tests/test_distributed.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-host job (idempotent for single-process runs).

    With no arguments, relies on the TPU environment's auto-detection;
    on CPU test clusters pass all three explicitly.
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def make_global_mesh(space: int = 1) -> Mesh:
    """('data', 'space') mesh over ALL processes' devices. The data axis
    enumerates global devices, so gradient reductions cross hosts (DCN)
    only where the device order does."""
    devices = np.asarray(jax.devices())
    n = devices.size
    if n % space:
        raise ValueError(f"{n} devices not divisible by space={space}")
    return Mesh(devices.reshape(n // space, space), ("data", "space"))


def host_local_to_global(mesh: Mesh, local_batch, spatial: bool = False):
    """Assemble a globally-sharded array from this host's shard.

    ``local_batch`` is the per-host slice (global_batch /
    process_count rows, in process_id order). Returns a jax.Array whose
    global shape stitches every host's contribution; no cross-host data
    movement happens (each device gets its host's rows).
    """
    spec = P("data", "space", None, None) if spatial else P("data")
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, local_batch)


def replicated_to_host(tree):
    """Host-local numpy copy of a fully-replicated global pytree.

    Under the global mesh, params/opt-state are replicated
    (``shard_params`` uses an empty PartitionSpec), so every process's
    addressable devices hold complete copies — pulling shard 0 is a
    purely local read with no collective, which lets ONE process run a
    host-side computation (e.g. evaluation) while the others proceed.
    """
    return jax.tree_util.tree_map(
        lambda a: np.asarray(a.addressable_data(0))
        if isinstance(a, jax.Array) else np.asarray(a), tree)


