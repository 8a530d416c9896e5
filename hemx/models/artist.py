"""'Artist' — shared encoder with two decoders (x̂ RGB and ŷ depth), two
optimizers training disjoint variable sets (reference: hem/models/artist.py).

Parity notes:
* encoder: VALID 5x5 stride-2 convs, channels 6,12,24,48,192,384, BN+lrelu
  except the first conv (artist.py:116-130); 256px input runs the full
  6-stage chain — stage count derives from the input size so smaller test
  inputs work (documented generalization);
* decoders mirror the encoder with BN+lrelu deconvs ending tanh
  (artist.py:133-154);
* losses: MSE on [0,1]-rescaled tensors; y-RMSE reported (artist.py:72-85);
* training split (artist.py:47-49): x-decoder step optimizes ONLY the
  x-decoder; y step optimizes encoder + y-decoder. Each step pulls a fresh
  batch (two sess.run calls in the reference's train()), y first.
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
from hemx.parallel.dp import jit_step
from hemx.train.optimizers import init_optimizer

_CHANNELS = [6, 12, 24, 48, 192, 384]


def _chain(size: int) -> list[int]:
    sizes = [size]
    while sizes[-1] >= 5 and len(sizes) <= len(_CHANNELS):
        sizes.append((sizes[-1] - 5) // 2 + 1)
    return sizes


def _lrelu02(x):
    return lrelu(x, 0.2)


def _encoder(name="encoder") -> Layer:
    def init_fn(key, in_shape):
        n, h, w, c = in_shape
        sizes = _chain(h)
        p = _P(key, initializers.xavier_uniform)
        cin = c
        for i in range(len(sizes) - 1):
            ch = _CHANNELS[i]
            p.conv(f"e{i+1}", 5, cin, ch)
            if i > 0:
                p.bn(f"e{i+1}", ch)
            cin = ch
        p.state.setdefault("_", jnp.zeros(()))
        return p.params, p.state, (n, sizes[-1], sizes[-1], cin)

    def apply_fn(params, state, x, ctx: Ctx):
        sizes = _chain(x.shape[1])
        a = _A(params, state, ctx, True)
        h = x
        for i in range(len(sizes) - 1):
            h = a.conv(f"e{i+1}", h, 2, "VALID", _lrelu02, bn=i > 0)
        return h, a.new_state

    return Layer(init_fn, apply_fn, name)


def _decoder(out_channels: int, image_size: int, name="decoder") -> Layer:
    sizes = _chain(image_size)

    def init_fn(key, in_shape):
        n = in_shape[0]
        p = _P(key, initializers.xavier_uniform)
        n_layers = len(sizes) - 1
        cin = _CHANNELS[n_layers - 1]
        for i in range(n_layers):
            last = i == n_layers - 1
            ch = out_channels if last else _CHANNELS[n_layers - 2 - i]
            p.deconv(f"d{i+1}", 5, cin, ch)
            if not last:
                p.bn(f"d{i+1}", ch)
            cin = ch
        p.state.setdefault("_", jnp.zeros(()))
        return p.params, p.state, (n, image_size, image_size, out_channels)

    def apply_fn(params, state, x, ctx: Ctx):
        a = _A(params, state, ctx, True)
        n_layers = len(sizes) - 1
        h = x
        for i in range(n_layers):
            last = i == n_layers - 1
            target = sizes[n_layers - 1 - i]
            if last:
                h = a.deconv(f"d{i+1}", h, (target, target), 2, "VALID",
                             jnp.tanh, bn=False)
            else:
                h = a.deconv(f"d{i+1}", h, (target, target), 2, "VALID",
                             _lrelu02)
        return h, a.new_state

    return Layer(init_fn, apply_fn, name)


class ArtistModel(ModelPlugin):
    name = "artist"

    @staticmethod
    def arguments() -> dict:
        return {}

    def __init__(self, args, mesh):
        super().__init__(args, mesh)
        self.x_optimizer = init_optimizer(args)
        self.y_optimizer = init_optimizer(args)

    def init_state(self, rng, sample_batch) -> dict:
        x = np.asarray(sample_batch["image"])
        n, h, w, c = x.shape
        self._enc = _encoder()
        self._x_dec = _decoder(c, h, "x_decoder")
        self._y_dec = _decoder(1, h, "y_decoder")
        ke, kx, ky = jax.random.split(rng, 3)
        pe, se, eshape = self._enc.init(ke, x.shape)
        px, sx, _ = self._x_dec.init(kx, eshape)
        py, sy, _ = self._y_dec.init(ky, eshape)
        params = {"encoder": pe, "x_decoder": px, "y_decoder": py}
        mstate = {"encoder": se, "x_decoder": sx, "y_decoder": sy}
        opt = {"x": self.x_optimizer.init({"x_decoder": px}),
               "y": self.y_optimizer.init({"encoder": pe, "y_decoder": py})}
        self._compile()
        return common.new_train_state(params, mstate, opt, self.args.seed,
                                      self.mesh)

    def _forward(self, params, mstate, x, ctx):
        e, ms_e = self._enc.apply(params["encoder"], mstate["encoder"], x, ctx)
        x_hat, ms_x = self._x_dec.apply(params["x_decoder"],
                                        mstate["x_decoder"], e, ctx)
        y_hat, ms_y = self._y_dec.apply(params["y_decoder"],
                                        mstate["y_decoder"], e, ctx)
        return x_hat, y_hat, {"encoder": ms_e, "x_decoder": ms_x,
                              "y_decoder": ms_y}

    @staticmethod
    def _losses(x, y, x_hat, y_hat):
        x01, y01 = (x + 1) / 2, (y + 1) / 2
        xh01, yh01 = (x_hat + 1) / 2, (y_hat + 1) / 2
        x_loss = jnp.mean((x01 - xh01) ** 2)
        y_loss = jnp.mean((y01 - yh01) ** 2)
        return x_loss, y_loss, jnp.sqrt(y_loss)

    def _compile(self):
        def y_step(ts, batch):
            """Optimize encoder + y_decoder (fresh batch)."""
            x = 2.0 * (batch["image"] - 0.5)
            y = 2.0 * (batch["depth"] - 0.5)
            rng, new_base = common.split_step_rng(ts)

            def loss_fn(sub):
                params = {**ts["params"], **sub}
                x_hat, y_hat, ms = self._forward(params, ts["mstate"], x,
                                                 Ctx(training=True, rng=rng))
                _, y_loss, y_rmse = self._losses(x, y, x_hat, y_hat)
                return y_loss, (ms, y_rmse)

            sub = {"encoder": ts["params"]["encoder"],
                   "y_decoder": ts["params"]["y_decoder"]}
            (y_loss, (ms, y_rmse)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(sub)
            new_sub, new_opt = common.apply_updates_group(
                self.y_optimizer, grads, ts["opt"]["y"], sub)
            new_ts = {**ts,
                      "params": {**ts["params"], **new_sub},
                      "mstate": ms,
                      "opt": {**ts["opt"], "y": new_opt},
                      "step": ts["step"],
                      "rng": new_base}
            return new_ts, {"y_loss": y_loss, "y_hat_rmse": y_rmse}

        def x_step(ts, batch):
            """Optimize x_decoder only (fresh batch)."""
            x = 2.0 * (batch["image"] - 0.5)
            y = 2.0 * (batch["depth"] - 0.5)
            rng, new_base = common.split_step_rng(ts)

            def loss_fn(sub):
                params = {**ts["params"], **sub}
                x_hat, y_hat, ms = self._forward(params, ts["mstate"], x,
                                                 Ctx(training=True, rng=rng))
                x_loss, _, _ = self._losses(x, y, x_hat, y_hat)
                return x_loss, ms

            sub = {"x_decoder": ts["params"]["x_decoder"]}
            (x_loss, ms), grads = jax.value_and_grad(loss_fn, has_aux=True)(sub)
            new_sub, new_opt = common.apply_updates_group(
                self.x_optimizer, grads, ts["opt"]["x"], sub)
            new_ts = {**ts,
                      "params": {**ts["params"], **new_sub},
                      "mstate": ms,
                      "opt": {**ts["opt"], "x": new_opt},
                      "step": ts["step"] + 1,
                      "rng": new_base}
            return new_ts, {"x_loss": x_loss}

        def predict(ts, batch):
            x = 2.0 * (batch["image"] - 0.5)
            x_hat, y_hat, _ = self._forward(ts["params"], ts["mstate"], x,
                                            Ctx(training=False, rng=ts["rng"]))
            return x_hat, y_hat

        def eval_step(ts, batch):
            x = 2.0 * (batch["image"] - 0.5)
            y = 2.0 * (batch["depth"] - 0.5)
            x_hat, y_hat, _ = self._forward(ts["params"], ts["mstate"], x,
                                            Ctx(training=True,
                                                rng=common.step_rng(ts)))
            x_loss, y_loss, y_rmse = self._losses(x, y, x_hat, y_hat)
            return {"x_loss": x_loss, "y_loss": y_loss, "y_hat_rmse": y_rmse}

        self._jit_y = jit_step(y_step, self.mesh)
        self._jit_x = jit_step(x_step, self.mesh)
        self._jit_eval = jit_step(eval_step, self.mesh, donate_argnums=())
        self._jit_predict = jit_step(predict, self.mesh, donate_argnums=())

    def batches_per_train_call(self) -> int:
        return 2

    def train(self, ts, stream):
        ts, y_metrics = self._jit_y(ts, next(stream))
        ts, x_metrics = self._jit_x(ts, next(stream))
        return ts, {**y_metrics, **x_metrics}

    def eval_losses(self, ts, batch) -> dict:
        return self._jit_eval(ts, batch)

    def write_summaries(self, writer, step, ts, batch) -> None:
        from hemx.ops.images import colorize
        x_hat, y_hat = self._jit_predict(ts, batch)
        n = min(self.args.examples, np.asarray(x_hat).shape[0])
        to01 = lambda a: np.clip((np.asarray(jax.device_get(a)) + 1) / 2, 0, 1)
        writer.montage("x", np.clip(np.asarray(
            jax.device_get(batch["image"]))[:n], 0, 1), step)
        writer.montage("y", colorize(np.asarray(
            jax.device_get(batch["depth"]))[:n]), step)
        writer.montage("x_hat", to01(x_hat)[:n], step)
        writer.montage("y_hat", colorize(to01(y_hat)[:n]), step)
