"""Shared training-state machinery for model plugins.

Train state is a plain dict pytree (msgpack-serializable):
  {"params": {...}, "mstate": {...}, "opt": {...}, "step": int32, "rng": key}

``step`` increments once per optimizer application — v1 reference semantics
where a GAN step counts both G and D applies (train.py global_step notes in
SURVEY.md §7.3); the epoch loop separately tracks one-train-call steps like
v2. Both counters end up in summaries.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hemx.core import Ctx


def new_train_state(params, mstate, opt_states, seed: int, mesh=None) -> dict:
    ts = {
        "params": params,
        "mstate": mstate,
        "opt": opt_states,
        "step": jnp.zeros((), jnp.int32),
        "rng": jax.random.PRNGKey(seed),
    }
    if mesh is not None:
        # Replicate onto the mesh NOW so the first jitted step sees the same
        # sharding signature as steady-state calls. Without this, step
        # outputs (NamedSharding) differ from init arrays (SingleDevice
        # sharding) and the second call triggers a full recompile.
        from hemx.parallel.mesh import replicated_sharding
        ts = jax.device_put(ts, replicated_sharding(mesh))
    return ts


def step_rng(ts: dict) -> jax.Array:
    """Per-step key: fold the step counter into the state's base key."""
    return jax.random.fold_in(ts["rng"], ts["step"])


def grad_finite_report(grads) -> dict:
    """Per-parameter finite-ness flags, named by tree path
    (the --check_numerics rebuild; reference: hem/util/training.py:52-53)."""
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    report = {}
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        report[name] = jnp.all(jnp.isfinite(leaf))
    return report


def raise_on_bad_grads(metrics: dict) -> None:
    """Host-side check of grad_finite_report output (loop calls this when
    --check_numerics). Raises with the offending parameter named, matching the
    reference's located-crash UX (doc/gradient_errors.txt)."""
    flags = metrics.get("grad_finite")
    if flags is None:
        return
    bad = [name for name, ok in flags.items() if not bool(ok)]
    if bad:
        raise FloatingPointError(
            "GRADIENT ERROR (NaN/Inf) on parameter(s): " + ", ".join(sorted(bad)))


def grad_norm(grads):
    """Global L2 norm of a gradient pytree — the cheap always-on gradient
    observability scalar (the reference logged per-variable gradient means,
    hem/ops/summaries.py:64-75; one global norm is the TPU-friendly form)."""
    import optax
    return optax.global_norm(grads)


def apply_updates_group(optimizer: optax.GradientTransformation, grads,
                        opt_state, params):
    updates, new_opt = optimizer.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), new_opt


def host_scalars(metrics: dict) -> dict:
    """Pull scalar metrics to host floats (single transfer per dict)."""
    out = {}
    for k, v in metrics.items():
        if k == "grad_finite":
            out[k] = {n: bool(f) for n, f in jax.device_get(v).items()}
        else:
            out[k] = float(jax.device_get(v))
    return out


def unflatten(h: int, w: int, c: int):
    """Reshape (B, H*W*C) -> (B, h, w, c) as a Layer (decoder seeds)."""
    from hemx.core import Layer

    def init(key, in_shape):
        return {}, {}, (in_shape[0], h, w, c)

    def apply(params, state, x, ctx):
        return x.reshape(x.shape[0], h, w, c), state

    return Layer(init, apply, "unflatten")


def cast_inputs(x, dtype_name: str):
    if dtype_name == "bfloat16":
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if jnp.issubdtype(a.dtype, jnp.floating) else a,
            x)
    return x
