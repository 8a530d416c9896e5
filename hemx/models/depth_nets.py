"""Architectures for the 65x65-patch depth-estimation model family.

All the thesis models share one spatial skeleton over VALID 5x5 stride-2
convs: encoder 65 -> 31 -> 14 -> 5 -> 1, skip-connected decoder
1 -> 5 -> 14 -> 31, final 31x31 (optionally cropped to 29x29) depth map
(reference: hem/models/sampler_gan.py:145-218, paper_cgan.py:212-318,
improved_sampler.py:262-540). Discriminators run separate rgb/depth conv
paths merged by 1x1 convs (sampler_gan.py:222-262, paper_cgan.py:318-389).

``valid_unet`` and ``two_path_disc`` are shape-generic: stage geometry is
derived from the input size with VALID arithmetic, so the canonical 65x65
reproduces the reference exactly while tests can run smaller inputs.
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


def _valid_out(size: int, k: int = 5, s: int = 2) -> int:
    return (size - k) // s + 1


def _enc_sizes(size: int, n: int, k: int = 5, s: int = 2) -> list[int]:
    sizes = [size]
    for _ in range(n):
        sizes.append(_valid_out(sizes[-1], k, s))
    return sizes


def _lrelu02(x):
    return lrelu(x, 0.2)


class _P:
    """Param/state bookkeeping helper for hand-built nets."""

    def __init__(self, key, init):
        self._keys = iter(jax.random.split(key, 256))
        self.init = init
        self.params: dict = {}
        self.state: dict = {}

    def conv(self, name, k, cin, cout):
        self.params[f"{name}_w"] = self.init(next(self._keys), (k, k, cin, cout))
        self.params[f"{name}_b"] = self.init(next(self._keys), (cout,))

    def deconv(self, name, k, cin, cout):
        # TF conv2d_transpose layout [H, W, out, in]
        self.params[f"{name}_w"] = self.init(next(self._keys), (k, k, cout, cin))
        self.params[f"{name}_b"] = self.init(next(self._keys), (cout,))

    def bn(self, name, channels):
        layer = batch_norm()
        p, s, _ = layer.init(next(self._keys), (1, 1, 1, channels))
        self.params[f"{name}_bn"] = p
        self.state[f"{name}_bn"] = s


class _A:
    """Apply-side helper mirroring _P."""

    def __init__(self, params, state, ctx: Ctx, use_bn: bool):
        self.params = params
        self.state = state
        self.new_state = dict(state)
        self.ctx = ctx
        self.use_bn = use_bn
        self._bn_layer = batch_norm()

    def conv(self, name, x, stride, padding, activation, bn=None):
        y = conv2d_op(x, self.params[f"{name}_w"], stride, padding)
        y = y + self.params[f"{name}_b"].astype(y.dtype)
        if (self.use_bn if bn is None else bn):
            y, s = self._bn_layer.apply(self.params[f"{name}_bn"],
                                        self.state[f"{name}_bn"], y, self.ctx)
            self.new_state[f"{name}_bn"] = s
        return activation(y) if activation else y

    def deconv(self, name, x, out_hw, stride, padding, activation, bn=None):
        y = deconv2d_op(x, self.params[f"{name}_w"], out_hw, stride, padding)
        y = y + self.params[f"{name}_b"].astype(y.dtype)
        if (self.use_bn if bn is None else bn):
            y, s = self._bn_layer.apply(self.params[f"{name}_bn"],
                                        self.state[f"{name}_bn"], y, self.ctx)
            self.new_state[f"{name}_bn"] = s
        return activation(y) if activation else y


def valid_unet(*, noise_channel: bool = False, garch: str = "small",
               mean_at_e1: bool = False,
               use_batch_norm: bool = False,
               final_activation: Optional[Callable] = jnp.tanh,
               final_filter: int = 5, final_crop: Optional[int] = None,
               init: Callable = initializers.xavier_uniform,
               name: str = "valid_unet") -> Layer:
    """The sampler/paper generator skeleton.

    Input: NHWC image (extra conditioning channels already concatenated by
    the caller). Options:
    * ``noise_channel`` — concat a uniform[-1,1] channel before e1
      (sampler_gan.py:171-173);
    * ``garch='large'`` — two extra stride-1 SAME convs per encoder stage
      and one per decoder stage (sampler_gan.py:174-216);
    * ``mean_at_e1`` — input is a tuple (x, y_bar); a constant y_bar channel
      is concatenated to e1 (paper_cgan g_mean_provided, :244-258);
    * ``final_filter``/``final_activation``/``final_crop`` — the closing
      stride-1 SAME conv (sampler_gan: 5x5 tanh 31x31; paper: 1x1 linear
      cropped to 29x29).
    """
    k = 5
    channels = (64, 128, 256, 512)

    def split_input(x):
        if mean_at_e1:
            return x  # (img, y_bar) tuple
        return (x, None)

    def init_fn(key, in_shape):
        n, h, w, c = in_shape
        sizes = _enc_sizes(h, 4, k)
        p = _P(key, init)
        cin = c + (1 if noise_channel else 0)
        enc_ch = []
        for i, cout in enumerate(channels):
            if i == 1 and mean_at_e1:
                cin += 1
            p.conv(f"e{i+1}", k, cin, cout)
            if use_batch_norm and i > 0:
                p.bn(f"e{i+1}", cout)
            if garch == "large" and i < 3:
                p.conv(f"e{i+1}b", k, cout, cout)
                p.conv(f"e{i+1}c", k, cout, cout)
                if use_batch_norm:
                    p.bn(f"e{i+1}b", cout)
                    p.bn(f"e{i+1}c", cout)
            enc_ch.append(cout)
            cin = cout
        # decoder: d1 512->256 (+skip e3), d2 ->128 (+skip e2), d3 ->64 (+skip e1)
        dec_plan = [(512, 256, enc_ch[2]), (512, 128, enc_ch[1]),
                    (256, 64, enc_ch[0])]
        if mean_at_e1:
            dec_plan[2] = (256, 64, enc_ch[0] + 1)  # e1 carries the mean channel
        for i, (cin_d, cout_d, skip_c) in enumerate(dec_plan):
            p.deconv(f"d{i+1}", k, cin_d, cout_d)
            if use_batch_norm:
                p.bn(f"d{i+1}", cout_d)
            if garch == "large":
                cc = cout_d + skip_c
                p.deconv(f"d{i+1}b", k, cc, cc)
                if use_batch_norm:
                    p.bn(f"d{i+1}b", cc)
        final_in = 64 + enc_ch[0] + (1 if mean_at_e1 else 0)
        p.conv("final", final_filter, final_in, 1)
        if use_batch_norm:
            # the reference's closing conv '7' inherits
            # use_batch_norm=args.batch_norm_gen from the decoder arg_scope
            # and hem.conv2d applies BN before the tanh
            # (sampler_gan.py:186-216; hem/ops/layers.py:125)
            p.bn("final", 1)
        p.state.setdefault("_", jnp.zeros(()))
        out = final_crop if final_crop else sizes[1]
        return p.params, p.state, (n, out, out, 1)

    def apply_fn(params, state, x, ctx: Ctx):
        x, y_bar = split_input(x)
        n, h, w, _ = x.shape
        sizes = _enc_sizes(h, 4, k)
        a = _A(params, state, ctx, use_batch_norm)
        if noise_channel:
            z = jax.random.uniform(ctx.next_rng(), (n, h, w, 1),
                                   minval=-1.0, maxval=1.0)
            x = jnp.concatenate([x, z], axis=-1)
        enc = []
        hcur = x
        for i in range(4):
            if i == 1 and mean_at_e1:
                mean_map = jnp.broadcast_to(
                    y_bar.reshape(n, 1, 1, 1),
                    (n, hcur.shape[1], hcur.shape[2], 1))
                hcur = jnp.concatenate([hcur, mean_map], axis=-1)
                enc[-1] = hcur  # the e1 skip includes the mean channel
            hcur = a.conv(f"e{i+1}", hcur, 2, "VALID", jax.nn.relu,
                          bn=use_batch_norm and i > 0)
            if garch == "large" and i < 3:
                hcur = a.conv(f"e{i+1}b", hcur, 1, "SAME", jax.nn.relu)
                hcur = a.conv(f"e{i+1}c", hcur, 1, "SAME", jax.nn.relu)
            enc.append(hcur)
        y = hcur
        for i, skip_idx in enumerate((2, 1, 0)):
            target = sizes[3 - i]
            y = a.deconv(f"d{i+1}", y, (target, target), 2, "VALID", _lrelu02)
            y = jnp.concatenate([y, enc[skip_idx]], axis=-1)
            if garch == "large":
                y = a.deconv(f"d{i+1}b", y, (target, target), 1, "SAME",
                             _lrelu02)
        y = a.conv("final", y, 1, "SAME", final_activation,
                   bn=use_batch_norm)
        if final_crop:
            y = y[:, :final_crop, :final_crop, :]
        return y, a.new_state

    return Layer(init_fn, apply_fn, name)


def two_path_disc(*, variant: str = "paper", use_batch_norm: bool = False,
                  depth_extra_channels: int = 0, rgb_extra_channels: int = 0,
                  init: Callable = initializers.xavier_uniform,
                  name: str = "two_path_disc") -> Layer:
    """Separate rgb/depth conv paths merged by 1x1 convs -> 1 logit.

    Variants:
    * ``'paper'`` — rgb 4x(VALID s2) to 1x1x512; depth (29x29 in) 3 convs to
      1x1x512; combined 1x1 convs 1024 -> 1024 -> 512 -> 1 (paper_cgan
      d_baseline, :318-341);
    * ``'early'`` — rgb one conv 65->31, depth stride-1 SAME conv, concat,
      3 convs to 1x1x512 logits (sampler_gan darch=early, :232-239);
    * ``'late'`` — two full 4-conv paths, concat at 1x1, conv 1024 -> 1024
      then 1x1 conv -> 512 logits (sampler_gan darch=late, :240-251).

    Input: tuple (x_rgb, depth). Extra conditioning channels are concatenated
    by the caller (counts declared so shapes infer).
    """
    k = 5

    def init_fn(key, in_shape):
        # in_shape is the rgb shape; depth shape inferred from variant use
        n, h, w, c = in_shape
        c_rgb = c + rgb_extra_channels
        c_depth = 1 + depth_extra_channels
        p = _P(key, init)
        if variant == "paper":
            for i, (cin, cout) in enumerate(
                    [(c_rgb, 64), (64, 128), (128, 256), (256, 512)]):
                p.conv(f"hx{i+1}", k, cin, cout)
            for i, (cin, cout) in enumerate(
                    [(c_depth, 128), (128, 256), (256, 512)]):
                p.conv(f"hy{i+1}", k, cin, cout)
            for nm, cin, cout in [("h1", 1024, 1024), ("h2", 1024, 512),
                                  ("h3", 512, 1)]:
                p.conv(nm, 1, cin, cout)
        elif variant == "early":
            p.conv("rgb", k, c_rgb, 64)
            p.conv("depth", k, c_depth, 64)
            # h3 has activation=None but INHERITS BN from the arg_scope
            # (sampler_gan.py:238; hem/ops/layers.py:125 applies BN even
            # with activation=None)
            for nm, cin, cout in [("h1", 128, 256), ("h2", 256, 512),
                                  ("h3", 512, 512)]:
                p.conv(nm, k, cin, cout)
                if use_batch_norm:
                    p.bn(nm, cout)
        elif variant == "late":
            for i, (cin, cout) in enumerate(
                    [(c_rgb, 64), (64, 128), (128, 256), (256, 512)]):
                p.conv(f"hx{i+1}", k, cin, cout)
                if use_batch_norm and i > 0:
                    p.bn(f"hx{i+1}", cout)
            plan = [(c_depth, 64), (64, 128), (128, 256), (256, 512)]
            for i, (cin, cout) in enumerate(plan):
                p.conv(f"hy{i+1}", k, cin, cout)
                if use_batch_norm and i > 0:
                    p.bn(f"hy{i+1}", cout)
            p.conv("ha", k, 1024, 1024)
            p.conv("hb", 1, 1024, 512)
            if use_batch_norm:
                # h.a AND the closing h.b inherit BN from the arg_scope
                # (sampler_gan.py:256-257)
                p.bn("ha", 1024)
                p.bn("hb", 512)
        else:
            raise ValueError(f"unknown disc variant {variant}")
        p.state.setdefault("_", jnp.zeros(()))
        return p.params, p.state, (n, 1, 1, 1)

    def apply_fn(params, state, xy, ctx: Ctx):
        x, depth = xy
        a = _A(params, state, ctx, use_batch_norm)
        if variant == "paper":
            h1 = x
            for i in range(4):
                h1 = a.conv(f"hx{i+1}", h1, 2, "VALID", _lrelu02, bn=False)
            h2 = depth
            for i in range(3):
                h2 = a.conv(f"hy{i+1}", h2, 2, "VALID", _lrelu02, bn=False)
            h = jnp.concatenate([h1, h2], axis=-1)
            h = a.conv("h1", h, 1, "SAME", _lrelu02, bn=False)
            h = a.conv("h2", h, 1, "SAME", _lrelu02, bn=False)
            h = a.conv("h3", h, 1, "SAME", None, bn=False)
        elif variant == "early":
            rgb = a.conv("rgb", x, 2, "VALID", _lrelu02, bn=False)
            dep = a.conv("depth", depth, 1, "SAME", _lrelu02, bn=False)
            h = jnp.concatenate([rgb, dep], axis=-1)
            h = a.conv("h1", h, 2, "VALID", _lrelu02)
            h = a.conv("h2", h, 2, "VALID", _lrelu02)
            h = a.conv("h3", h, 2, "VALID", None)  # BN from scope, no act
        else:  # late
            h1 = x
            for i in range(4):
                h1 = a.conv(f"hx{i+1}", h1, 2, "VALID", _lrelu02,
                            bn=use_batch_norm and i > 0)
            h2 = depth
            # depth path: first conv stride-1 SAME (31x31 stays), then VALID
            h2 = a.conv("hy1", h2, 1, "SAME", _lrelu02, bn=False)
            for i in range(1, 4):
                h2 = a.conv(f"hy{i+1}", h2, 2, "VALID", _lrelu02,
                            bn=use_batch_norm)
            h = jnp.concatenate([h1, h2], axis=-1)
            h = a.conv("ha", h, 1, "SAME", _lrelu02)
            h = a.conv("hb", h, 2, "SAME", _lrelu02)  # BN from scope
        return h, a.new_state

    return Layer(init_fn, apply_fn, name)
