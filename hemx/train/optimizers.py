"""Optimizer factory — the reference's 9-way switch rebuilt on optax
(reference: hem/util/training.py:59-92, util.py:150-183).

Supported names: rmsprop, adadelta, adagrad, sgd, pgd, padagrad, momentum,
adam, ftrl. ``pgd``/``padagrad`` were TF's proximal variants; with the
reference's default zero regularization they reduce to sgd/adagrad, which is
what we provide (documented deviation — the reference never set the proximal
regularization strengths either).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def init_optimizer(args) -> optax.GradientTransformation:
    name = args.optimizer
    if name == "rmsprop":
        # tf.train.RMSPropOptimizer parity: TF initializes the mean-square
        # accumulator to ONES (optax defaults to zeros — its initial_scale
        # exists precisely for TF parity) and uses epsilon=1e-10 (optax
        # 1e-8). With zeros-init the first step is ~lr*sign(g)/sqrt(1-decay),
        # visibly changing early training vs the reference transcripts.
        return optax.rmsprop(args.lr, decay=args.decay, momentum=args.momentum,
                             centered=args.centered, eps=1e-10,
                             initial_scale=1.0)
    if name == "adadelta":
        # tf.train.AdadeltaOptimizer defaults: rho=0.95, epsilon=1e-8
        # (optax defaults rho=0.9, eps=1e-6)
        return optax.adadelta(args.lr, rho=0.95, eps=1e-8)
    if name in ("adagrad", "padagrad"):
        return optax.adagrad(args.lr)
    if name in ("sgd", "pgd"):
        return optax.sgd(args.lr)
    if name == "momentum":
        return optax.sgd(args.lr, momentum=args.momentum)
    if name == "adam":
        return optax.adam(args.lr, b1=args.beta1, b2=args.beta2)
    if name == "ftrl":
        return ftrl(args.lr)
    raise ValueError(f"unknown optimizer: {name}")


class FtrlState(NamedTuple):
    n: optax.Updates  # accumulated squared gradients
    z: optax.Updates  # ftrl linear term


def ftrl(learning_rate: float, learning_rate_power: float = -0.5,
         l1: float = 0.0, l2: float = 0.0,
         initial_accumulator_value: float = 0.1) -> optax.GradientTransformation:
    """FTRL-Proximal (McMahan et al. 2013), matching tf.train.FtrlOptimizer
    defaults. Not in optax; implemented here for the factory's 9-way parity."""

    def init_fn(params):
        n = jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, initial_accumulator_value), params)
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return FtrlState(n=n, z=z)

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("ftrl requires params")

        def per_leaf(g, n, z, p):
            new_n = n + g * g
            sigma = (new_n ** -learning_rate_power
                     - n ** -learning_rate_power) / learning_rate
            new_z = z + g - sigma * p
            # closed-form proximal solution
            new_p = jnp.where(
                jnp.abs(new_z) <= l1,
                jnp.zeros_like(p),
                -(new_z - jnp.sign(new_z) * l1)
                / (new_n ** -learning_rate_power / learning_rate + 2.0 * l2),
            )
            return new_p - p, new_n, new_z

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_n = treedef.flatten_up_to(state.n)
        flat_z = treedef.flatten_up_to(state.z)
        flat_p = treedef.flatten_up_to(params)
        updates, new_n, new_z = [], [], []
        for g, n, z, p in zip(flat_g, flat_n, flat_z, flat_p):
            u, nn, nz = per_leaf(g, n, z, p)
            updates.append(u)
            new_n.append(nn)
            new_z.append(nz)
        return (treedef.unflatten(updates),
                FtrlState(n=treedef.unflatten(new_n), z=treedef.unflatten(new_z)))

    return optax.GradientTransformation(init_fn, update_fn)


def clip_params(params, clip: float = 0.01):
    """WGAN weight clipping, applied functionally after the update
    (reference: models/gan.py:141-142 clip-by-assign side effect)."""
    return jax.tree_util.tree_map(lambda p: jnp.clip(p, -clip, clip), params)
