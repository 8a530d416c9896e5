"""InfoGAN sketch (reference: hem/models/info_gan.py).

The reference file is an incomplete single-GPU sketch — its VALID deconvs
lack output shapes (they would not build) and the predictor is a one-conv
stub. hemx implements the same design as a *working* model, documented
deviations:
* G(z, x): conv chain (normal(0.02) init, lrelu) then mirrored deconvs to a
  tanh depth map — SAME padding so the encode/decode chain is well-defined
  at any power-of-two size (the reference's VALID chain was unbuildable);
* D(depth): conv chain to a sigmoid score (info_gan.py:79-96);
* Q predictor: 1x1 conv depth -> tanh RGB (info_gan.py:99-108);
* losses (info_gan.py:27-32): log-loss GAN terms plus the mutual-information
  term cross_entropy - entropy computed exactly as the reference wrote it;
* training (info_gan.py:45-50): sequential D, G, Q steps, each on a fresh
  batch; Q's step optimizes predictor + generator variables.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hemx.core import Ctx, Layer
from hemx.models import common
from hemx.models.depth_nets import _A, _P
from hemx.models.plugin import ModelPlugin
from hemx.ops import initializers
from hemx.ops.activations import lrelu
from hemx.ops.losses import guarded_one_minus
from hemx.parallel.dp import jit_step
from hemx.train.optimizers import init_optimizer


def _lrelu02(x):
    return lrelu(x, 0.2)


def _generator(name="generator") -> Layer:
    chans = [64, 128, 256, 512]

    def init_fn(key, in_shape):
        n, h, w, c = in_shape
        p = _P(key, initializers.normal(0.02))
        cin = c + 1  # z channel
        for i, ch in enumerate(chans):
            p.conv(f"g{i+1}", 5, cin, ch)
            cin = ch
        for i, ch in enumerate([256, 128, 64, 1]):
            p.deconv(f"g{i+5}", 5, cin, ch)
            cin = ch
        p.state.setdefault("_", jnp.zeros(()))
        return p.params, p.state, (n, h, w, 1)

    def apply_fn(params, state, xz, ctx: Ctx):
        x, z = xz
        a = _A(params, state, ctx, False)
        h = jnp.concatenate([x, z], axis=-1)
        sizes = [h.shape[1]]
        for i in range(4):
            h = a.conv(f"g{i+1}", h, 2, "SAME", _lrelu02, bn=False)
            sizes.append(h.shape[1])
        for i, act in zip(range(4), [_lrelu02, _lrelu02, _lrelu02, jnp.tanh]):
            target = sizes[3 - i]
            h = a.deconv(f"g{i+5}", h, (target, target), 2, "SAME", act,
                         bn=False)
        return h, a.new_state

    return Layer(init_fn, apply_fn, name)


def _discriminator(name="discriminator") -> Layer:
    chans = [64, 128, 256, 512, 256, 1]

    def init_fn(key, in_shape):
        n = in_shape[0]
        p = _P(key, initializers.normal(0.02))
        cin = 1
        for i, ch in enumerate(chans):
            p.conv(f"d{i+1}", 5, cin, ch)
            cin = ch
        p.state.setdefault("_", jnp.zeros(()))
        return p.params, p.state, (n, 1, 1, 1)

    def apply_fn(params, state, y, ctx: Ctx):
        a = _A(params, state, ctx, False)
        h = y
        for i in range(len(chans)):
            act = jax.nn.sigmoid if i == len(chans) - 1 else _lrelu02
            h = a.conv(f"d{i+1}", h, 2, "SAME", act, bn=False)
        return h, a.new_state

    return Layer(init_fn, apply_fn, name)


def _predictor(name="predictor") -> Layer:
    def init_fn(key, in_shape):
        n, h, w, _ = in_shape
        p = _P(key, initializers.normal(0.02))
        p.conv("q1", 1, 1, 3)
        p.state.setdefault("_", jnp.zeros(()))
        return p.params, p.state, (n, h, w, 3)

    def apply_fn(params, state, y, ctx: Ctx):
        a = _A(params, state, ctx, False)
        return a.conv("q1", y, 1, "SAME", jnp.tanh, bn=False), a.new_state

    return Layer(init_fn, apply_fn, name)


class InfoGan(ModelPlugin):
    name = "info_gan"

    @staticmethod
    def arguments() -> dict:
        return {}

    def __init__(self, args, mesh):
        super().__init__(args, mesh)
        self.g_optimizer = init_optimizer(args)
        self.d_optimizer = init_optimizer(args)
        self.q_optimizer = init_optimizer(args)

    def init_state(self, rng, sample_batch) -> dict:
        x = np.asarray(sample_batch["image"])
        n, h, w, c = x.shape
        self._g = _generator()
        self._d = _discriminator()
        self._q = _predictor()
        kg, kd, kq = jax.random.split(rng, 3)
        pg, sg, gshape = self._g.init(kg, x.shape)
        pd, sd, _ = self._d.init(kd, gshape)
        pq, sq, _ = self._q.init(kq, gshape)
        params = {"generator": pg, "discriminator": pd, "predictor": pq}
        mstate = {"generator": sg, "discriminator": sd, "predictor": sq}
        opt = {"g": self.g_optimizer.init(pg),
               "d": self.d_optimizer.init(pd),
               "q": self.q_optimizer.init({"predictor": pq, "generator": pg})}
        self._compile()
        return common.new_train_state(params, mstate, opt, self.args.seed,
                                      self.mesh)

    def _gen(self, params, mstate, x, rng, ctx):
        z = jax.random.uniform(rng, x.shape[:3] + (1,))
        g, ms = self._g.apply(params["generator"], mstate["generator"],
                              (x, z), ctx)
        return g, ms

    def _compile(self):
        eps = 1e-8

        def d_step(ts, batch):
            x = 2.0 * (batch["image"] - 0.5)
            y = 2.0 * (batch["depth"] - 0.5)
            rng, new_base = common.split_step_rng(ts)

            def loss_fn(pd):
                params = {**ts["params"], "discriminator": pd}
                ctx = Ctx(training=True, rng=rng)
                g, _ = self._gen(params, ts["mstate"], x, rng, ctx)
                d_real, ms1 = self._d.apply(pd, ts["mstate"]["discriminator"],
                                            y, ctx)
                d_fake, ms2 = self._d.apply(pd, ms1, g, ctx)
                d_loss = -jnp.mean(jnp.log(d_real + eps)
                                   + jnp.log(guarded_one_minus(d_fake) + eps))
                return d_loss, ms2

            (d_loss, ms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                ts["params"]["discriminator"])
            new_d, new_opt = common.apply_updates_group(
                self.d_optimizer, grads, ts["opt"]["d"],
                ts["params"]["discriminator"])
            new_ts = {**ts, "params": {**ts["params"], "discriminator": new_d},
                      "mstate": {**ts["mstate"], "discriminator": ms},
                      "opt": {**ts["opt"], "d": new_opt},
                      "rng": new_base}
            return new_ts, {"d_loss": d_loss}

        def g_step(ts, batch):
            x = 2.0 * (batch["image"] - 0.5)
            rng, new_base = common.split_step_rng(ts)

            def loss_fn(pg):
                params = {**ts["params"], "generator": pg}
                ctx = Ctx(training=True, rng=rng)
                g, ms_g = self._gen(params, ts["mstate"], x, rng, ctx)
                d_fake, _ = self._d.apply(ts["params"]["discriminator"],
                                          ts["mstate"]["discriminator"], g, ctx)
                return -jnp.mean(jnp.log(d_fake + eps)), ms_g

            (g_loss, ms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                ts["params"]["generator"])
            new_g, new_opt = common.apply_updates_group(
                self.g_optimizer, grads, ts["opt"]["g"],
                ts["params"]["generator"])
            new_ts = {**ts, "params": {**ts["params"], "generator": new_g},
                      "mstate": {**ts["mstate"], "generator": ms},
                      "opt": {**ts["opt"], "g": new_opt},
                      "rng": new_base}
            return new_ts, {"g_loss": g_loss}

        def q_step(ts, batch):
            x = 2.0 * (batch["image"] - 0.5)
            rng, new_base = common.split_step_rng(ts)

            def loss_fn(sub):
                params = {**ts["params"], **sub}
                ctx = Ctx(training=True, rng=rng)
                g, _ = self._gen(params, ts["mstate"], x, rng, ctx)
                q, ms_q = self._q.apply(params["predictor"],
                                        ts["mstate"]["predictor"], g, ctx)
                # mutual-information term exactly as written
                # (info_gan.py:30-32); x in [-1,1] makes the logs partially
                # undefined in the reference too — clamped via eps here
                x01 = (x + 1.0) / 2.0
                q01 = (q + 1.0) / 2.0
                cross_entropy = jnp.mean(-jnp.sum(
                    jnp.log(q01 + eps) * x01, axis=-1))
                entropy = jnp.mean(-jnp.sum(jnp.log(x01 + eps) * x01, axis=-1))
                return cross_entropy + entropy, ms_q

            sub = {"predictor": ts["params"]["predictor"],
                   "generator": ts["params"]["generator"]}
            (q_loss, ms), grads = jax.value_and_grad(loss_fn, has_aux=True)(sub)
            new_sub, new_opt = common.apply_updates_group(
                self.q_optimizer, grads, ts["opt"]["q"], sub)
            new_ts = {**ts, "params": {**ts["params"], **new_sub},
                      "mstate": {**ts["mstate"], "predictor": ms},
                      "opt": {**ts["opt"], "q": new_opt},
                      "step": ts["step"] + 1,
                      "rng": new_base}
            return new_ts, {"q_loss": q_loss}

        def eval_step(ts, batch):
            x = 2.0 * (batch["image"] - 0.5)
            y = 2.0 * (batch["depth"] - 0.5)
            rng = common.step_rng(ts)
            ctx = Ctx(training=True, rng=rng)
            g, _ = self._gen(ts["params"], ts["mstate"], x, rng, ctx)
            d_real, _ = self._d.apply(ts["params"]["discriminator"],
                                      ts["mstate"]["discriminator"], y, ctx)
            d_fake, _ = self._d.apply(ts["params"]["discriminator"],
                                      ts["mstate"]["discriminator"], g, ctx)
            return {"g_loss": -jnp.mean(jnp.log(d_fake + eps)),
                    "d_loss": -jnp.mean(jnp.log(d_real + eps)
                                        + jnp.log(guarded_one_minus(d_fake) + eps))}

        self._jit_d = jit_step(d_step, self.mesh)
        self._jit_g = jit_step(g_step, self.mesh)
        self._jit_q = jit_step(q_step, self.mesh)
        self._jit_eval = jit_step(eval_step, self.mesh, donate_argnums=())

    def batches_per_train_call(self) -> int:
        return 3

    def train(self, ts, stream):
        ts, dm = self._jit_d(ts, next(stream))
        ts, gm = self._jit_g(ts, next(stream))
        ts, qm = self._jit_q(ts, next(stream))
        return ts, {**dm, **gm, **qm}

    def eval_losses(self, ts, batch) -> dict:
        return self._jit_eval(ts, batch)
