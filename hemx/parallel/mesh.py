"""Device mesh construction and sharding helpers.

The TPU-native replacement for the reference's in-graph GPU towers
(reference: hem/util/scoping.py:66-89 tower_scope_range,
hem/util/training.py:23-56 average_gradients, hem/ops/input.py batch_slice):

* a 1-D ``data`` mesh over local (or all, multi-host) devices;
* the global batch is sharded over ``data``; params/opt-state are replicated;
* gradient reduction is whatever XLA inserts for the mean-loss grad over the
  sharded batch — an ICI all-reduce, not a host round trip.

Multi-host: ``initialize_distributed`` wires jax.distributed so the same mesh
spans slices over DCN (the reference was single-process; this is the rebuild's
§2.8 communication-backend component).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (no-op single-process)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(n_devices: int = 0, devices=None) -> Mesh:
    """1-D data-parallel mesh over ``n_devices`` (0 = all available)."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices and n_devices > 0:
        if n_devices > len(devs):
            raise ValueError(
                f"requested {n_devices} devices but only {len(devs)} available")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding (axis 0 over 'data')."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
