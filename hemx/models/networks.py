"""Reusable network builders for the conditional model zoo.

``unet`` reproduces the pix2pix generator family (reference:
hem/models/pix2pix.py:160-230): conv encoder halving spatial dims to 1x1,
deconv decoder with skip concatenations, optional uniform-noise injection at
input/latent/end, dropout (keep-prob semantics) on early decoder layers.
``patchgan`` is the 70x70 patch discriminator (pix2pix.py:232-262). The
sampler/estimator models build their nets from ``hemx.models.depth_nets``.

Stage counts derive from the input size (the reference hardcoded 256x256 for
pix2pix and 64/65 px for the samplers); channel schedules double from
``base`` and cap at ``max_filters`` — identical to the reference at its
native sizes.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from hemx.core import Ctx, Layer
from hemx.ops import initializers
from hemx.ops.activations import lrelu
from hemx.ops.layers import batch_norm, conv2d_op, deconv2d_op


def normal_init(stddev: float = 0.02):
    return initializers.normal(stddev)


class _BN:
    """Tiny helper bundling per-site batch-norm params/state."""

    def __init__(self, enabled: bool):
        self.enabled = enabled
        self.layer = batch_norm() if enabled else None

    def init(self, key, shape, params, state, name):
        if self.enabled:
            p, s, _ = self.layer.init(key, shape)
            params[name] = p
            state[name] = s

    def apply(self, params, state, new_state, name, x, ctx):
        if not self.enabled:
            return x
        y, s = self.layer.apply(params[name], state[name], x, ctx)
        new_state[name] = s
        return y


def unet(out_channels: int = 1, *, base: int = 64, max_filters: int = 512,
         filter_size: int = 4, bn_gen: bool = False, bn_dec: bool = True,
         noise: Sequence[str] = (), dropout_keep: float = 0.0,
         n_dropout_layers: int = 3,
         init: Callable = None, final_activation=jnp.tanh,
         enc_activation=lambda x: lrelu(x, 0.2),
         dec_activation=jax.nn.relu,
         name: str = "unet") -> Layer:
    """Encoder/decoder with skip concats (pix2pix generator).

    ``noise``: subset of {'input','latent','end'} — concat a uniform[-1,1]
    noise channel at that site (reference: pix2pix.py:184-230).
    ``dropout_keep``: keep-prob applied to the first ``n_dropout_layers``
    decoder layers when > 0 (reference passes its --dropout arg straight
    through as keep_prob).
    """
    init = init or normal_init(0.02)
    noise = tuple(noise)

    def init_fn(key, in_shape):
        n, h, w, c = in_shape
        assert h == w, f"unet requires square inputs, got {h}x{w}"
        n_down = int(math.log2(h))
        assert 2 ** n_down == h, f"unet requires power-of-2 size, got {h}"
        params, state = {}, {}
        keys = jax.random.split(key, 8 * n_down + 8)
        ki = iter(keys)
        enc_bn = _BN(bn_gen)
        dec_bn = _BN(bn_dec)

        enc_channels = []
        cur_c = c + (1 if "input" in noise else 0)
        sh, sw = h, w
        for i in range(n_down):
            out_c = min(base * (2 ** i), max_filters)
            params[f"e{i+1}_w"] = init(next(ki),
                                       (filter_size, filter_size, cur_c, out_c))
            params[f"e{i+1}_b"] = init(next(ki), (out_c,))
            sh, sw = sh // 2, sw // 2
            if i > 0:  # first conv has no BN (pix2pix.py:186-189)
                enc_bn.init(next(ki), (n, sh, sw, out_c), params, state,
                            f"e{i+1}_bn")
            enc_channels.append(out_c)
            cur_c = out_c

        dec_channels = []
        # 'latent' noise is a full bottleneck-width channel block (the
        # reference concats uniform[batch, 512, 1, 1] onto the 512-channel
        # e8, making d1's input 1024 channels — pix2pix.py:206-208)
        cur_c = enc_channels[-1] + (enc_channels[-1] if "latent" in noise else 0)
        for i in range(n_down):
            depth_from_end = n_down - 1 - i
            if i == n_down - 1:
                out_c = out_channels
            else:
                out_c = min(base * (2 ** (depth_from_end - 1)), max_filters)
            if i == n_down - 1 and "end" in noise:
                cur_c += 1
            params[f"d{i+1}_w"] = init(next(ki),
                                       (filter_size, filter_size, out_c, cur_c))
            params[f"d{i+1}_b"] = init(next(ki), (out_c,))
            sh, sw = sh * 2, sw * 2
            # the reference's hem.deconv2d applies BN before the activation
            # on EVERY decoder layer including the final tanh layer '8'
            # (pix2pix.py:196-228 decoder arg_scope use_batch_norm=True with
            # no override on '8'; hem/ops/layers.py:200)
            dec_bn.init(next(ki), (n, sh, sw, out_c), params, state,
                        f"d{i+1}_bn")
            if i < n_down - 1:
                # skip concat doubles channels for the next deconv
                cur_c = out_c + enc_channels[depth_from_end - 1]
            dec_channels.append(out_c)
        state.setdefault("_", jnp.zeros(()))  # keep state non-empty
        return params, state, (n, h, w, out_channels)

    def apply_fn(params, state, x, ctx: Ctx):
        n_down = int(math.log2(x.shape[1]))
        new_state = dict(state)
        enc_bn = _BN(bn_gen)
        dec_bn = _BN(bn_dec)
        nb = x.shape[0]

        if "input" in noise:
            z = jax.random.uniform(ctx.next_rng(),
                                   (nb, x.shape[1], x.shape[2], 1),
                                   minval=-1.0, maxval=1.0)
            x = jnp.concatenate([x, z], axis=-1)
        skips = []
        h = x
        for i in range(n_down):
            h = conv2d_op(h, params[f"e{i+1}_w"], 2, "SAME") + params[f"e{i+1}_b"]
            if i > 0:
                h = enc_bn.apply(params, state, new_state, f"e{i+1}_bn", h, ctx)
            h = enc_activation(h)
            skips.append(h)
        if "latent" in noise:
            # bottleneck-width independent noise channels (reference:
            # uniform[batch, 512, 1, 1] at the 1x1 bottleneck,
            # pix2pix.py:206-208)
            z = jax.random.uniform(
                ctx.next_rng(), (nb, h.shape[1], h.shape[2], h.shape[-1]),
                minval=-1.0, maxval=1.0)
            h = jnp.concatenate([h, z], axis=-1)
        for i in range(n_down):
            depth_from_end = n_down - 1 - i
            last = i == n_down - 1
            if last and "end" in noise:
                z = jax.random.uniform(ctx.next_rng(),
                                       (nb, h.shape[1], h.shape[2], 1),
                                       minval=-1.0, maxval=1.0)
                h = jnp.concatenate([h, z], axis=-1)
            target = (h.shape[1] * 2, h.shape[2] * 2)
            h = deconv2d_op(h, params[f"d{i+1}_w"], target, 2, "SAME") \
                + params[f"d{i+1}_b"]
            # BN before the activation on every decoder layer, including
            # the final tanh one (reference decoder arg_scope, see init_fn)
            h = dec_bn.apply(params, state, new_state, f"d{i+1}_bn", h, ctx)
            if not last:
                h = dec_activation(h)
                if dropout_keep > 0 and i < n_dropout_layers and ctx.training:
                    mask = jax.random.bernoulli(ctx.next_rng(), dropout_keep,
                                                h.shape)
                    h = jnp.where(mask, h / dropout_keep, 0.0)
                h = jnp.concatenate([h, skips[depth_from_end - 1]], axis=-1)
            else:
                h = final_activation(h) if final_activation is not None else h
        return h, new_state

    return Layer(init_fn, apply_fn, name)


def patchgan(channels: Sequence[int] = (64, 128, 256, 512), *,
             filter_size: int = 4, bn_disc: bool = False,
             init: Callable = None,
             activation=lambda x: lrelu(x, 0.2),
             name: str = "patchgan") -> Layer:
    """PatchGAN discriminator returning per-patch logits
    (reference: pix2pix.py:232-262: 4 stride-2 convs then 1-channel conv,
    no BN on the first layer, sigmoid applied by the loss)."""
    init = init or normal_init(0.02)

    def init_fn(key, in_shape):
        n, h, w, c = in_shape
        params, state = {}, {}
        keys = jax.random.split(key, 3 * (len(channels) + 1))
        ki = iter(keys)
        bn = _BN(bn_disc)
        cur_c = c
        sh, sw = h, w
        for i, out_c in enumerate(channels):
            params[f"m{i+1}_w"] = init(next(ki),
                                       (filter_size, filter_size, cur_c, out_c))
            params[f"m{i+1}_b"] = init(next(ki), (out_c,))
            sh, sw = -(-sh // 2), -(-sw // 2)
            if i > 0:
                bn.init(next(ki), (n, sh, sw, out_c), params, state,
                        f"m{i+1}_bn")
            cur_c = out_c
        k = len(channels) + 1
        params[f"m{k}_w"] = init(next(ki), (filter_size, filter_size, cur_c, 1))
        params[f"m{k}_b"] = init(next(ki), (1,))
        sh, sw = -(-sh // 2), -(-sw // 2)
        # the final logits conv m5 inherits BN from the reference's
        # arg_scope (only m1 overrides use_batch_norm=False —
        # pix2pix.py:246-260; hem/ops/layers.py:125 applies BN even with
        # activation=None)
        bn.init(next(ki), (n, sh, sw, 1), params, state, f"m{k}_bn")
        state.setdefault("_", jnp.zeros(()))
        return params, state, (n, sh, sw, 1)

    def apply_fn(params, state, x, ctx: Ctx):
        new_state = dict(state)
        bn = _BN(bn_disc)
        h = x
        for i in range(len(channels)):
            h = conv2d_op(h, params[f"m{i+1}_w"], 2, "SAME") + params[f"m{i+1}_b"]
            if i > 0:
                h = bn.apply(params, state, new_state, f"m{i+1}_bn", h, ctx)
            h = activation(h)
        k = len(channels) + 1
        h = conv2d_op(h, params[f"m{k}_w"], 2, "SAME") + params[f"m{k}_b"]
        h = bn.apply(params, state, new_state, f"m{k}_bn", h, ctx)
        return h, new_state

    return Layer(init_fn, apply_fn, name)
