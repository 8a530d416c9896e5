"""Supervised per-image mean-depth estimator
(reference: hem/models/mean_depth_estimator.py).

E2 architecture (mean_depth_estimator.py:96-121): 6 stride-2 5x5 relu convs
(64, 128, 256, 512, 1024, 2048) -> flatten -> dense 2048 -> dense 1 sigmoid.
The reference fed the NYUv2 ``include_originals`` images (53x70); hemx uses
``x_full``/``y_full`` when the batch provides them, otherwise image/depth —
the flatten size adapts by shape inference.

Loss (mean_depth_estimator.py:137-147): mean(sqrt(square(mean_depth - m)))
— i.e. mean ABSOLUTE error of the predicted means (the sqrt-of-square is
kept as the reference wrote it).

Exposes ``predict_mean(ts, batch)`` for composition with
experimental_sampler (reference stashes self.output_layer,
mean_depth_estimator.py:54).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hemx.core import Ctx, sequential
from hemx.models import common
from hemx.models.plugin import ModelPlugin
from hemx.ops.layers import conv2d, dense, flatten
from hemx.parallel.dp import jit_step
from hemx.train.optimizers import init_optimizer


def _x_y(batch):
    x = batch.get("x_full", batch.get("image"))
    y = batch.get("y_full", batch.get("depth"))
    return x, y


class MeanDepthEstimator(ModelPlugin):
    name = "mean_depth_estimator"

    @staticmethod
    def arguments() -> dict:
        return {
            "--m_arch": dict(type=str, default="E2",
                             help="Estimator architecture (E2 only, like the "
                                  "reference)."),
        }

    def __init__(self, args, mesh):
        super().__init__(args, mesh)
        self.optimizer = init_optimizer(args)
        self._net = None

    def _build(self):
        act = jax.nn.relu
        return sequential(
            conv2d(64, 5, 2, activation=act, name="l1"),
            conv2d(128, 5, 2, activation=act, name="l2"),
            conv2d(256, 5, 2, activation=act, name="l3"),
            conv2d(512, 5, 2, activation=act, name="l4"),
            conv2d(1024, 5, 2, activation=act, name="l5"),
            conv2d(2048, 5, 2, activation=act, name="l6"),
            flatten(),
            dense(2048, name="l7"),
            dense(1, activation=jax.nn.sigmoid, name="l8"),
            name="model",
        )

    def _loss(self, m, y):
        mean_depth = jnp.mean(y, axis=(1, 2, 3), keepdims=False)[:, None]
        return jnp.mean(jnp.sqrt(jnp.square(mean_depth - m)))

    def init_state(self, rng, sample_batch) -> dict:
        x, _ = _x_y({k: np.asarray(v) for k, v in sample_batch.items()})
        self._net = self._build()
        params, mstate, _ = self._net.init(rng, x.shape)
        opt = self.optimizer.init(params)
        self._compile()
        return common.new_train_state(params, mstate, opt, self.args.seed,
                                      self.mesh)

    def _compile(self):
        check = self.args.check_numerics

        def train_step(ts, batch):
            x, y = _x_y(batch)

            def loss_fn(params):
                m, new_mstate = self._net.apply(
                    params, ts["mstate"], x,
                    Ctx(training=True, rng=common.step_rng(ts)))
                return self._loss(m, y), new_mstate

            (loss, new_mstate), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(ts["params"])
            new_params, new_opt = common.apply_updates_group(
                self.optimizer, grads, ts["opt"], ts["params"])
            metrics = {"m_loss": loss,
                       "m_grad_norm": common.grad_norm(grads)}
            if check:
                metrics["grad_finite"] = common.grad_finite_report(grads)
            return ({**ts, "params": new_params, "mstate": new_mstate,
                     "opt": new_opt, "step": ts["step"] + 1}, metrics)

        def eval_step(ts, batch):
            x, y = _x_y(batch)
            m, _ = self._net.apply(ts["params"], ts["mstate"], x,
                                   Ctx(training=False, rng=ts["rng"]))
            return {"m_loss": self._loss(m, y)}

        def predict(ts, batch):
            x, _ = _x_y(batch)
            m, _ = self._net.apply(ts["params"], ts["mstate"], x,
                                   Ctx(training=False, rng=ts["rng"]))
            return m

        self._jit_train = jit_step(train_step, self.mesh)
        self._jit_eval = jit_step(eval_step, self.mesh, donate_argnums=())
        self._jit_predict = jit_step(predict, self.mesh, donate_argnums=())

    def train(self, ts, stream):
        return self._jit_train(ts, next(stream))

    def eval_losses(self, ts, batch) -> dict:
        return self._jit_eval(ts, batch)

    def predict_mean(self, ts, batch):
        """Per-image predicted mean depth, (B, 1) — composition hook
        (reference: experimental_sampler.py:119-141 consumes this under
        stop_gradient)."""
        return self._jit_predict(ts, batch)

    def write_summaries(self, writer, step, ts, batch) -> None:
        from hemx.ops.images import colorize
        x, y = _x_y(batch)
        n = min(self.args.examples, np.asarray(x).shape[0])
        m = np.asarray(jax.device_get(self.predict_mean(ts, batch)))[:n]
        x_host = np.asarray(jax.device_get(x))[:n]
        y_host = np.asarray(jax.device_get(y))[:n]
        writer.montage("model/real_images", np.clip(x_host, 0, 1), step)
        writer.montage("model/real_depths", colorize(y_host), step)
        real_means = y_host.mean(axis=(1, 2, 3))
        writer.montage("model/real_average_depths",
                       np.broadcast_to(real_means[:, None, None, None],
                                       (n, 8, 8, 1)).copy(), step)
        writer.montage("model/predicted_average_depths",
                       np.broadcast_to(m[:, :, None, None],
                                       (n, 8, 8, 1)).copy(), step)
