"""Activation functions (reference: ops/activations.py, hem/ops/activations.py)."""

from __future__ import annotations

import jax.numpy as jnp

# SELU constants (Klambauer et al. 2017), as in reference hem/ops/activations.py:31-58.
_SELU_ALPHA = 1.6732632423543772848170429916717
_SELU_SCALE = 1.0507009873554804934193349852946


def lrelu(x, leak: float = 0.2):
    """Leaky ReLU, default leak 0.2 (reference: ops/activations.py lrelu)."""
    return jnp.maximum(x, leak * x)


def selu(x):
    """Scaled exponential linear unit (reference: hem/ops/activations.py:31)."""
    return _SELU_SCALE * jnp.where(x >= 0.0, x, _SELU_ALPHA * jnp.expm1(x))


def value_fraction(x, value: float = 0.0):
    """Fraction of entries equal to ``value`` (reference: hem/ops/activations.py:61-66)."""
    return jnp.mean(jnp.equal(x, value).astype(jnp.float32))
