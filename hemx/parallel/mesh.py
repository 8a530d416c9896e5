"""Device mesh construction and sharding helpers.

The TPU-native replacement for the reference's in-graph GPU towers
(reference: hem/util/scoping.py:66-89 tower_scope_range,
hem/util/training.py:23-56 average_gradients, hem/ops/input.py batch_slice):

* a ``data`` mesh axis over local (or all, multi-host) devices;
* the global batch is sharded over ``data``; params/opt-state are replicated
  over it; gradient reduction is whatever XLA inserts for the mean-loss grad
  over the sharded batch — an ICI all-reduce, not a host round trip;
* an optional second ``model`` axis (``--model_parallel N``) tensor-shards
  every conv/dense kernel's output-channel dim (and its optimizer moments)
  over ``N`` devices — GSPMD then partitions the MXU work and activations
  channel-wise and places the boundary collectives on ICI. The reference has
  no analogue (its scaling story stops at 2-GPU towers); this is the
  TPU-native scaling dimension for models whose params/activations outgrow
  one chip's HBM.

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
MODEL_AXIS = "model"


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (no-op single-process)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(n_devices: int = 0, devices=None, model: int = 1) -> Mesh:
    """Mesh over ``n_devices`` (0 = all available).

    ``model=1`` (default): 1-D data-parallel mesh, axes ``("data",)``.
    ``model=m>1``: 2-D ``(data=n/m, model=m)`` mesh — batch sharded over
    ``data``, kernel output channels over ``model`` (see module docstring).
    """
    devs = list(devices if devices is not None else jax.devices())
    if n_devices and n_devices > 0:
        if n_devices > len(devs):
            raise ValueError(
                f"requested {n_devices} devices but only {len(devs)} available")
        devs = devs[:n_devices]
    model = max(int(model), 1)
    if model == 1:
        return Mesh(np.array(devs), (DATA_AXIS,))
    if len(devs) % model:
        raise ValueError(
            f"--model_parallel {model} does not divide {len(devs)} devices")
    grid = np.array(devs).reshape(len(devs) // model, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def model_axis_size(mesh: Mesh) -> int:
    return mesh.shape.get(MODEL_AXIS, 1)


def data_axis_size(mesh: Mesh) -> int:
    """Batch-sharding degree: ``--batch_size`` is per data-shard, so the
    global batch is ``batch_size * data_axis_size`` (== device count on a
    pure-DP mesh; devices on the 'model' axis share one batch shard)."""
    return mesh.shape.get(DATA_AXIS, mesh.size)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding (axis 0 over 'data'; replicated over 'model')."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_spec(shape, model: int) -> P:
    """Tensor-parallel PartitionSpec for one train-state leaf.

    Kernels (ndim >= 2) shard their last (output-channel / output-feature)
    dim over ``model`` when divisible — conv HWIO kernels, dense [in, out]
    kernels, and their optimizer moments (same shapes) all hit this rule.
    Everything else (biases, BN scale/stats, scalars, rng keys) replicates:
    they are O(C) or O(1), and GSPMD re-slices them against the sharded
    channel dim for free.
    """
    if (model > 1 and len(shape) >= 2 and shape[-1] >= model
            and shape[-1] % model == 0):
        return P(*([None] * (len(shape) - 1)), MODEL_AXIS)
    return P()


def state_shardings(mesh: Mesh, tree):
    """Pytree of NamedShardings for a train state: DP meshes replicate
    everything; a mesh with a 'model' axis applies :func:`param_spec`."""
    m = model_axis_size(mesh)
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, param_spec(np.shape(x), m)), tree)
