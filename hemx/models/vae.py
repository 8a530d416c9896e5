"""Variational autoencoder (reference: models/vae.py).

Parity notes:
* encoder = CNN-AE encoder with batch-norm + lrelu (models/vae.py:100-110);
* latent = two dense heads z_mean / z_stddev, reparameterized
  ``z = mu + sigma * eps`` with eps ~ N(0,1) (models/vae.py:113-129 — the
  reference's "stddev head" is a plain dense output, not softplus'd; kept);
* decoder ends sigmoid; decodes both z (reconstruction) and the raw eps
  samples (generation path) (models/vae.py:36-37);
* losses are SUM-reduced Bernoulli recon + KL (models/vae.py:75-83) so
  magnitudes match examples/examples.org (BASELINE.md row 4);
* the reference differentiates ONLY the reconstruction loss
  (``opt.compute_gradients(d_loss)``, models/vae.py:41) — the KL term is
  summarized but never optimized, an apparent bug. hemx optimizes
  d_loss + l_loss (the correct VAE objective) by default; pass
  --vae_parity_loss to reproduce the reference exactly.
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
from hemx.ops.losses import bernoulli_recon_loss, kl_gaussian_loss
from hemx.parallel.dp import jit_step
from hemx.train.optimizers import init_optimizer


class VaeModel(ModelPlugin):
    name = "vae"
    batch_keys = ("image",)

    @staticmethod
    def arguments() -> dict:
        return {
            "--latent_size": dict(type=int, default=200),
            "--vae_parity_loss": dict(action="store_true", default=False,
                                      help="Optimize only the reconstruction "
                                           "loss, exactly like the reference "
                                           "(models/vae.py:41)."),
        }

    def __init__(self, args, mesh):
        super().__init__(args, mesh)
        self.optimizer = init_optimizer(args)
        self._nets = None
        self._eh = self._ew = None

    def _build(self, in_shape):
        n, h, w, c = in_shape
        latent = self.args.latent_size
        encoder = sequential(
            conv2d(64, 5, 2, use_batch_norm=True, activation=lrelu, name="c1"),
            conv2d(128, 5, 2, use_batch_norm=True, activation=lrelu, name="c2"),
            conv2d(256, 5, 2, use_batch_norm=True, activation=lrelu, name="c3"),
            conv2d(256, 5, 2, use_batch_norm=True, activation=lrelu, name="c4"),
            conv2d(96, 1, use_batch_norm=True, activation=lrelu, name="c5"),
            conv2d(32, 1, use_batch_norm=True, activation=lrelu, name="c6"),
            name="encoder",
        )
        eh, ew = -(-h // 16), -(-w // 16)
        self._eh, self._ew = eh, ew
        mean_head = sequential(flatten(), dense(latent, name="d1"), name="z_mean")
        std_head = sequential(flatten(), dense(latent, name="d2"), name="z_stddev")
        decoder = sequential(
            dense(32 * eh * ew, activation=jax.nn.relu, name="d1"),
            common.unflatten(eh, ew, 32),
            conv2d(96, 1, activation=jax.nn.relu, name="c1"),
            conv2d(256, 1, activation=jax.nn.relu, name="c2"),
            deconv2d(256, 5, 2, activation=jax.nn.relu, name="dc1"),
            deconv2d(128, 5, 2, activation=jax.nn.relu, name="dc2"),
            deconv2d(64, 5, 2, activation=jax.nn.relu, name="dc3"),
            deconv2d(c, 5, 2, activation=jax.nn.sigmoid, name="dc4"),
            name="decoder",
        )
        return {"encoder": encoder, "z_mean": mean_head,
                "z_stddev": std_head, "decoder": decoder}

    def _forward(self, params, mstate, x, ctx: Ctx):
        nets = self._nets
        new_mstate = dict(mstate)
        e, new_mstate["encoder"] = nets["encoder"].apply(
            params["encoder"], mstate["encoder"], x, ctx)
        z_mean, _ = nets["z_mean"].apply(params["z_mean"], mstate["z_mean"], e, ctx)
        z_stddev, _ = nets["z_stddev"].apply(params["z_stddev"], mstate["z_stddev"], e, ctx)
        eps = jax.random.normal(ctx.next_rng(), z_mean.shape)
        z = z_mean + z_stddev * eps
        d_real, new_mstate["decoder"] = nets["decoder"].apply(
            params["decoder"], mstate["decoder"], z, ctx)
        # crop to the input size for non-multiple-of-16 images (see cnn.py)
        d_real = d_real[:, :x.shape[1], :x.shape[2], :]
        # Spatial meshes need no sharding pins here: measured drift of an
        # sp=2 sgd step vs single-device equals the plain dp=8 drift to 3
        # digits (f32 reduction-order noise on the sum-reduced loss, not a
        # partitioner defect — unlike the GAN families, which DO need pins;
        # see common.pin_batch_sharding and TestSpatialParallel).
        return d_real, z_mean, z_stddev, eps, new_mstate

    def _losses(self, x, d_real, z_mean, z_stddev):
        d_loss = bernoulli_recon_loss(x, d_real)
        l_loss = kl_gaussian_loss(z_mean, z_stddev)
        t_loss = d_loss + l_loss
        return {"d_loss": d_loss, "l_loss": l_loss, "total_loss": t_loss}

    def init_state(self, rng, sample_batch) -> dict:
        x = np.asarray(sample_batch["image"])
        nets = self._build(x.shape)
        self._nets = nets
        keys = jax.random.split(rng, len(nets) + 1)
        params, mstate = {}, {}
        shape = x.shape
        p, s, eshape = nets["encoder"].init(keys[0], shape)
        params["encoder"], mstate["encoder"] = p, s
        p, s, zshape = nets["z_mean"].init(keys[1], eshape)
        params["z_mean"], mstate["z_mean"] = p, s
        p, s, _ = nets["z_stddev"].init(keys[2], eshape)
        params["z_stddev"], mstate["z_stddev"] = p, s
        p, s, _ = nets["decoder"].init(keys[3], zshape)
        params["decoder"], mstate["decoder"] = p, s
        opt = self.optimizer.init(params)
        self._compile()
        return common.new_train_state(params, mstate, opt, self.args.seed, self.mesh)

    def _compile(self):
        check = self.args.check_numerics
        parity = self.args.vae_parity_loss

        def train_step(ts, batch):
            x = batch["image"]

            def loss_fn(params):
                d_real, z_mean, z_stddev, _, new_mstate = self._forward(
                    params, ts["mstate"], x,
                    Ctx(training=True, rng=common.step_rng(ts)))
                losses = self._losses(x, d_real, z_mean, z_stddev)
                objective = losses["d_loss"] if parity else losses["total_loss"]
                return objective, (losses, new_mstate)

            (_, (losses, new_mstate)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(ts["params"])
            new_params, new_opt = common.apply_updates_group(
                self.optimizer, grads, ts["opt"], ts["params"])
            metrics = dict(losses)
            metrics["grad_norm"] = common.grad_norm(grads)
            if check:
                metrics["grad_finite"] = common.grad_finite_report(grads)
            new_ts = {**ts, "params": new_params, "mstate": new_mstate,
                      "opt": new_opt, "step": ts["step"] + 1}
            return new_ts, metrics

        def eval_step(ts, batch):
            x = batch["image"]
            d_real, z_mean, z_stddev, _, _ = self._forward(
                ts["params"], ts["mstate"], x,
                Ctx(training=False, rng=common.step_rng(ts)))
            return self._losses(x, d_real, z_mean, z_stddev)

        def decode_samples(ts, rng, n):
            eps = jax.random.normal(rng, (n, self.args.latent_size))
            d_fake, _ = self._nets["decoder"].apply(
                ts["params"]["decoder"], ts["mstate"]["decoder"], eps,
                Ctx(training=False))
            return d_fake

        def recon(ts, batch):
            d_real, *_ = self._forward(ts["params"], ts["mstate"], batch["image"],
                                       Ctx(training=False, rng=ts["rng"]))
            return d_real

        def capture(ts, batch):
            ctx = Ctx(training=True, rng=common.step_rng(ts), capture=True)
            self._forward(ts["params"], ts["mstate"], batch["image"][:8], ctx)
            return common.summarizable_stats(ctx.intermediates)

        def report_grads(ts, batch):
            def loss_fn(params):
                d_real, z_mean, z_stddev, _, _ = self._forward(
                    params, ts["mstate"], batch["image"],
                    Ctx(training=True, rng=common.step_rng(ts)))
                losses = self._losses(batch["image"], d_real, z_mean, z_stddev)
                return losses["d_loss"] if parity else losses["total_loss"]
            return common.summarizable_stats(jax.grad(loss_fn)(ts["params"]))

        self._jit_train = jit_step(train_step, self.mesh)
        self._jit_eval = jit_step(eval_step, self.mesh, donate_argnums=())
        self._jit_recon = jit_step(recon, self.mesh, donate_argnums=())
        self._decode_samples = jax.jit(decode_samples, static_argnums=(2,))
        self._jit_capture = jit_step(capture, self.mesh, donate_argnums=())
        self._jit_grad_report = jit_step(report_grads, self.mesh,
                                         donate_argnums=())

    def train(self, ts, stream):
        return self._jit_train(ts, next(stream))

    def eval_losses(self, ts, batch) -> dict:
        return self._jit_eval(ts, batch)

    def capture_activations(self, ts, batch):
        return self._jit_capture(ts, batch)

    def grad_report(self, ts, batch):
        return self._jit_grad_report(ts, batch)

    def write_summaries(self, writer, step, ts, batch) -> None:
        n = min(self.args.examples, batch["image"].shape[0])
        x = np.asarray(jax.device_get(batch["image"]))[:n]
        recon = np.asarray(jax.device_get(self._jit_recon(ts, batch)))[:n]
        fake = np.asarray(jax.device_get(
            self._decode_samples(ts, jax.random.fold_in(ts["rng"], step), n)))
        writer.montage("examples/inputs", np.clip(x, 0, 1), step)
        writer.montage("examples/real_decoded", np.clip(recon, 0, 1), step)
        writer.montage("examples/fake_decoded", np.clip(fake, 0, 1), step)

