"""Data-parallel step wrapping.

``jit_step`` compiles a pure train step with the batch sharded over the mesh's
``data`` axis and everything else replicated. XLA inserts the gradient
all-reduce over ICI (scaling-book recipe: annotate shardings, let the compiler
place collectives). This replaces the reference's tower loop + CPU gradient
averaging (hem/util/training.py:23-56) with zero host involvement.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hemx.parallel.mesh import DATA_AXIS, data_sharding, replicated_sharding


def host_slice(batch, *, process_index=None, process_count=None):
    """Slice a GLOBAL host batch down to this process's portion.

    Multi-host data feeding (replaces the reference's batch_slice per-GPU
    slicing, hem/ops/input.py:10-26, at the host level): every process
    iterates the same seeded global order, keeps rows
    [pi*per : (pi+1)*per], and shard_batch assembles the global array from
    the local shards.
    """
    pc = jax.process_count() if process_count is None else process_count
    if pc == 1:
        return batch
    pi = jax.process_index() if process_index is None else process_index

    def sl(x):
        per = x.shape[0] // pc
        return x[pi * per:(pi + 1) * per]

    return jax.tree_util.tree_map(sl, batch)


def shard_batch(batch, mesh: Mesh):
    """Place a host (numpy) batch onto the mesh, sharded on axis 0.

    Single-host: a device_put of the global batch with a data sharding.
    Multi-host: the GLOBAL batch is host-sliced to this process's portion
    and assembled via jax.make_array_from_process_local_data.
    """
    sharding = data_sharding(mesh)
    if jax.process_count() > 1:
        local = host_slice(batch)
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)),
            local)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def jit_step(step_fn: Callable, mesh: Mesh, *, batch_argnums=(1,),
             donate_argnums=(0,), static_argnums=()) -> Callable:
    """jit ``step_fn(train_state, batch, ...)`` with DP shardings.

    The train_state (argument 0) is replicated and donated (in-place update on
    device); batch arguments are sharded on their leading axis. Outputs are
    left to XLA (state stays replicated; scalar metrics are replicated).
    """
    repl = replicated_sharding(mesh)
    data = data_sharding(mesh)

    def in_sharding_for(argnum):
        return data if argnum in batch_argnums else repl

    # cache the jitted function per arity to avoid re-wrapping
    @functools.lru_cache(maxsize=8)
    def _jitted(n_args: int):
        in_shardings = tuple(in_sharding_for(i) for i in range(n_args))
        return jax.jit(step_fn,
                       in_shardings=in_shardings,
                       donate_argnums=donate_argnums,
                       static_argnums=static_argnums)

    def call(*args):
        return _jitted(len(args))(*args)

    return call
