"""Convolutional autoencoder (reference: models/cnn.py).

Architecture parity: 6-conv lrelu encoder (64,128,256,256 stride-2 5x5 then
96,32 1x1), dense latent (default 200), decoder dense + two 1x1 convs + four
stride-2 5x5 deconvs ending tanh; input rescaled [0,1] -> [-1,1]
(models/cnn.py:31-32, 96-134); L1 loss (models/cnn.py:75-79).

Generalizations over the reference: input H/W/C are taken from the data (the
reference hardcoded 64x64x3); encoder output spatial dims feed shape
inference. With 64x64x3 inputs the parameterization is identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hemx.core import Ctx, sequential
from hemx.models import common
from hemx.models.plugin import ModelPlugin
from hemx.ops.activations import lrelu
from hemx.ops.layers import conv2d, deconv2d, dense, flatten
from hemx.parallel.dp import jit_step
from hemx.train.optimizers import init_optimizer


class CnnModel(ModelPlugin):
    name = "cnn"
    batch_keys = ("image",)

    @staticmethod
    def arguments() -> dict:
        return {
            "--latent_size": dict(type=int, default=200,
                                  help="Size of the latent bottleneck "
                                       "(reference: train.py --latent_size)."),
        }

    def __init__(self, args, mesh):
        super().__init__(args, mesh)
        self.optimizer = init_optimizer(args)
        self._net = None
        self._jit_train = None
        self._jit_eval = None
        self._jit_recon = None

    # -- network ------------------------------------------------------------
    def _build(self, in_shape):
        n, h, w, c = in_shape
        latent = self.args.latent_size
        encoder = sequential(
            conv2d(64, 5, 2, activation=lrelu, name="c1"),
            conv2d(128, 5, 2, activation=lrelu, name="c2"),
            conv2d(256, 5, 2, activation=lrelu, name="c3"),
            conv2d(256, 5, 2, activation=lrelu, name="c4"),
            conv2d(96, 1, activation=lrelu, name="c5"),
            conv2d(32, 1, activation=lrelu, name="c6"),
            name="encoder",
        )
        eh, ew = -(-h // 16), -(-w // 16)
        latent_net = sequential(flatten(), dense(latent, name="d1"), name="latent")
        decoder = sequential(
            dense(32 * eh * ew, activation=jax.nn.relu, name="d1"),
            common.unflatten(eh, ew, 32),
            conv2d(96, 1, activation=jax.nn.relu, name="c1"),
            conv2d(256, 1, activation=jax.nn.relu, name="c2"),
            deconv2d(256, 5, 2, activation=jax.nn.relu, name="dc1"),
            deconv2d(128, 5, 2, activation=jax.nn.relu, name="dc2"),
            deconv2d(64, 5, 2, activation=jax.nn.relu, name="dc3"),
            deconv2d(c, 5, 2, activation=jnp.tanh, name="dc4"),
            name="decoder",
        )
        return sequential(encoder, latent_net, decoder, name="cnn")

    def _forward(self, params, mstate, x, ctx: Ctx):
        x = 2.0 * (x - 0.5)  # rescale to [-1,1] (models/cnn.py:31-32)
        d, new_mstate = self._net.apply(params, mstate, x, ctx)
        # non-multiple-of-16 inputs (e.g. 28px MNIST): the decoder produces
        # the next multiple of 16; crop back (the reference sidestepped this
        # by resizing every dataset to 64x64 — data.py:44)
        d = d[:, :x.shape[1], :x.shape[2], :]
        loss = jnp.mean(jnp.abs(x - d))
        return d, loss, new_mstate

    # -- plugin API -----------------------------------------------------------
    def init_state(self, rng, sample_batch) -> dict:
        x = np.asarray(sample_batch["image"])
        self._net = self._build(x.shape)
        k_init, k_state = jax.random.split(rng)
        params, mstate, _ = self._net.init(k_init, x.shape)
        opt = self.optimizer.init(params)
        self._compile()
        return common.new_train_state(
            params, mstate, opt,
            int(jax.random.randint(k_state, (), 0, 2**31 - 1)), self.mesh)

    def _compile(self):
        check = self.args.check_numerics

        def train_step(ts, batch):
            x = batch["image"]

            def loss_fn(params):
                _, loss, new_mstate = self._forward(
                    params, ts["mstate"], x,
                    Ctx(training=True, rng=common.step_rng(ts)))
                return loss, new_mstate

            (loss, new_mstate), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(ts["params"])
            new_params, new_opt = common.apply_updates_group(
                self.optimizer, grads, ts["opt"], ts["params"])
            metrics = {"loss": loss, "grad_norm": common.grad_norm(grads)}
            if check:
                metrics["grad_finite"] = common.grad_finite_report(grads)
            new_ts = {**ts, "params": new_params, "mstate": new_mstate,
                      "opt": new_opt, "step": ts["step"] + 1}
            return new_ts, metrics

        def eval_step(ts, batch):
            _, loss, _ = self._forward(ts["params"], ts["mstate"], batch["image"],
                                       Ctx(training=False, rng=ts["rng"]))
            return {"loss": loss}

        def recon(ts, batch):
            d, _, _ = self._forward(ts["params"], ts["mstate"], batch["image"],
                                    Ctx(training=False, rng=ts["rng"]))
            return (d + 1.0) / 2.0

        def capture(ts, batch):
            ctx = Ctx(training=True, rng=common.step_rng(ts), capture=True)
            self._forward(ts["params"], ts["mstate"], batch["image"][:8], ctx)
            return common.summarizable_stats(ctx.intermediates)

        def report_grads(ts, batch):
            def loss_fn(params):
                _, loss, _ = self._forward(
                    params, ts["mstate"], batch["image"],
                    Ctx(training=True, rng=common.step_rng(ts)))
                return loss
            return common.summarizable_stats(jax.grad(loss_fn)(ts["params"]))

        self._jit_train = jit_step(train_step, self.mesh)
        self._jit_eval = jit_step(eval_step, self.mesh, donate_argnums=())
        self._jit_recon = jit_step(recon, self.mesh, donate_argnums=())
        self._jit_capture = jit_step(capture, self.mesh, donate_argnums=())
        self._jit_grad_report = jit_step(report_grads, self.mesh,
                                         donate_argnums=())

    def train(self, ts, stream):
        ts, metrics = self._jit_train(ts, next(stream))
        return ts, metrics

    def eval_losses(self, ts, batch) -> dict:
        return self._jit_eval(ts, batch)

    def capture_activations(self, ts, batch):
        return self._jit_capture(ts, batch)

    def grad_report(self, ts, batch):
        return self._jit_grad_report(ts, batch)

    def write_summaries(self, writer, step, ts, batch) -> None:
        n = min(self.args.examples, batch["image"].shape[0])
        recon = np.asarray(jax.device_get(self._jit_recon(ts, batch)))[:n]
        x = np.asarray(jax.device_get(batch["image"]))[:n]
        writer.montage("examples/inputs", np.clip(x, 0, 1), step)
        writer.montage("examples/outputs", np.clip(recon, 0, 1), step)

