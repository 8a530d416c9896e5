"""Data-parallel step wrapping.

``jit_step`` compiles a pure train step with the batch sharded over the mesh's
``data`` axis and everything else replicated. XLA inserts the gradient
all-reduce over ICI (scaling-book recipe: annotate shardings, let the compiler
place collectives). This replaces the reference's tower loop + CPU gradient
averaging (hem/util/training.py:23-56) with zero host involvement.
"""

from __future__ import annotations

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
    """jit ``step_fn(train_state, batch, ...)`` with mesh shardings.

    The train_state (argument 0) is donated (in-place update on device) and
    sharded by the mesh's rule — fully replicated on a DP mesh; kernel
    output channels over the 'model' axis on a tensor-parallel mesh
    (hemx.parallel.mesh.state_shardings). Batch arguments are sharded on
    their leading axis over 'data'. Outputs are left to XLA.
    """
    from hemx.parallel.mesh import model_axis_size, state_shardings

    repl = replicated_sharding(mesh)
    data = data_sharding(mesh)
    tp = model_axis_size(mesh) > 1

    def in_sharding_for(argnum):
        return data if argnum in batch_argnums else repl

    # cache the jitted function per call signature to avoid re-wrapping.
    # On a TP mesh the state's sharding tree depends on its leaf shapes, so
    # the key includes the state's treedef + shapes (a handful of model
    # variants per process — the cache stays tiny).
    _cache: dict = {}

    def _jitted(n_args: int, state=None):
        in_shardings = tuple(in_sharding_for(i) for i in range(n_args))
        key: tuple = (n_args,)
        kwargs = {}
        if state is not None:
            leaves, treedef = jax.tree_util.tree_flatten(state)
            key = (n_args, treedef, tuple(np.shape(l) for l in leaves))
            if key in _cache:
                return _cache[key]
            shards = state_shardings(mesh, state)
            in_shardings = (shards,) + in_shardings[1:]
            if 0 in donate_argnums:
                # Donating steps return (new_state, metrics) by framework
                # convention (ModelPlugin docstring). Pin the new state's
                # out_shardings to the SAME rule tree: otherwise GSPMD may
                # propagate e.g. P('model') onto a bias output, and the
                # next call's donated input then mismatches in_shardings
                # (donated args cannot be auto-resharded).
                kwargs["out_shardings"] = (shards, repl)
        fn = _cache.get(key)
        if fn is None:
            fn = _cache[key] = jax.jit(step_fn,
                                       in_shardings=in_shardings,
                                       donate_argnums=donate_argnums,
                                       static_argnums=static_argnums,
                                       **kwargs)
        return fn

    def call(*args):
        state = args[0] if (tp and 0 not in batch_argnums) else None
        return _jitted(len(args), state)(*args)

    return call
