"""Parameter initializers.

The reference initializes *every* variable — including biases — with
``tf.contrib.layers.xavier_initializer`` (reference: ops/layers.py:52-53,
hem/ops/layers.py). We reproduce that exactly, including TF's fan
computation rules, so fresh-model statistics match.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _fans(shape) -> tuple[float, float]:
    """Fan-in/out following TF variance_scaling_initializer rules."""
    if len(shape) == 0:
        return 1.0, 1.0
    if len(shape) == 1:
        # TF treats 1-D shapes (biases) as fan_in == fan_out == shape[0].
        return float(shape[0]), float(shape[0])
    if len(shape) == 2:
        return float(shape[0]), float(shape[1])
    receptive = 1.0
    for d in shape[:-2]:
        receptive *= d
    return receptive * shape[-2], receptive * shape[-1]


def xavier_uniform(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """Glorot/Xavier uniform: U(-limit, limit), limit = sqrt(6/(fan_in+fan_out))."""
    fan_in, fan_out = _fans(shape)
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def zeros(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    return jnp.zeros(shape, dtype)


def ones(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    return jnp.ones(shape, dtype)


def normal(stddev: float = 0.02):
    def init(key, shape, dtype=jnp.float32):
        return stddev * jax.random.normal(key, shape, dtype)
    return init
