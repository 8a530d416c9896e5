"""Activation functions (reference: ops/activations.py, hem/ops/activations.py)."""

from __future__ import annotations

import jax.numpy as jnp

# SELU constants: the paper values (Klambauer et al. 2017), like
# jax.nn.selu. DELIBERATE DEVIATION from the reference, which hardcodes a
# typo'd scale=1.507 / alpha=1.67236 (hem/ops/activations.py:31) — a 43%
# over-scale that breaks the self-normalizing property the activation
# exists for. No reference model ever calls selu, so nothing trained on
# the typo'd constants.
_SELU_ALPHA = 1.6732632423543772848170429916717
_SELU_SCALE = 1.0507009873554804934193349852946


def lrelu(x, leak: float = 0.2):
    """Leaky ReLU, default leak 0.2 (reference: ops/activations.py lrelu)."""
    return jnp.maximum(x, leak * x)


def selu(x):
    """Scaled exponential linear unit (reference: hem/ops/activations.py:31;
    constants deviation documented above). The negative branch clamps its
    input before ``expm1``: with a bare ``where``, expm1 overflows to inf
    for x >= ~88.7 in f32 in the NON-selected branch and jax.grad returns
    NaN (0 * inf) even though the forward value is finite."""
    safe = jnp.minimum(x, 0.0)
    return _SELU_SCALE * jnp.where(x >= 0.0, x, _SELU_ALPHA * jnp.expm1(safe))


def value_fraction(x, value: float = 0.0):
    """Fraction of entries equal to ``value`` (reference: hem/ops/activations.py:61-66)."""
    return jnp.mean(jnp.equal(x, value).astype(jnp.float32))
