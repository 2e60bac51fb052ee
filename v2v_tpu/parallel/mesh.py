"""Device mesh + sharding helpers.

The reference scales with NCCL DDP (train.py:41-58). TPU-native
equivalent: one jit program over a `jax.sharding.Mesh` with the batch
sharded along a 'data' axis — XLA inserts the gradient all-reduce
(psum) over ICI/DCN automatically. No process groups, no samplers; each
host feeds its shard via `make_array_from_process_local_data`.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the first n) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh,
                process_count: Optional[int] = None) -> Any:
    """Place every array in the batch pytree with its leading axis split
    over the data axis.

    Single-process: a plain `device_put` with the batch sharding.
    Multi-host (`jax.process_count() > 1`): each host holds only its
    local shard (global_batch / process_count rows — the per-host index
    slicing in data/interface.py:_indices), and `device_put` cannot
    place host-local rows onto a global mesh; the global array is
    assembled with `jax.make_array_from_process_local_data` instead
    (DistributedSampler replacement, reference train.py:41-58).

    `process_count` overrides the autodetected count (for tests)."""
    pc = jax.process_count() if process_count is None else process_count
    sharding = batch_sharding(mesh)
    if pc > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
