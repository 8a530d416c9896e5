"""The thesis 'paper_*' model family (reference: hem/models/paper_sampler.py,
paper_noise.py, paper_baseline_sampler.py, paper_standalone.py,
paper_baseline_standalone.py).

All share paper_cgan's input prep — y*10 meters, crop_to_bounding_box
(17,17,29,29), per-image mean y_bar — and the VALID 65->31->14->5->1
generator skeleton with a 1x1 linear head cropped to 29x29.

* ``paper_sampler`` — experiment 2: mean-adjusted cGAN whose generator takes
  uniform[0,1) noise at a configurable site --noise_layer
  {x,e1,e2,e3,e4,e4-512,d2,d3,d4} (paper_sampler.py:159-240), optional
  encoder BN (--e_bn); Adam with separate g/d lr+betas; Eigen metric
  summaries incl. sampler-path metrics (paper_sampler.py:304-342).
* ``paper_noise`` — ablation: same mean-adjusted cGAN with input noise only
  (paper_noise.py:137-167).
* ``paper_baseline_sampler`` — no-noise GAN baseline with model_version
  {baseline, mean_adjusted, mean_provided} (paper_baseline_sampler.py:85-110).
* ``paper_standalone`` — NO discriminator: supervised generator, loss =
  rmse(y/10, y_hat/10), model_version variants
  (paper_standalone.py:244-254).
* ``paper_baseline_standalone`` — supervised baseline generator
  (paper_baseline_standalone.py:188-199).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hemx.core import Ctx, Layer
from hemx.metrics.eigen import eigen_metrics
from hemx.models import common
from hemx.models.conditional import ConditionalGanBase
from hemx.models.depth_nets import _A, _P, valid_unet, two_path_disc
from hemx.models.paper_cgan import PaperCgan
from hemx.models.plugin import ModelPlugin
from hemx.ops import initializers
from hemx.ops.activations import lrelu
from hemx.ops.images import crop_to_bounding_box
from hemx.ops.losses import rmse
from hemx.parallel.dp import jit_step

_X = initializers.xavier_uniform

NOISE_SITES = ["x", "e1", "e2", "e3", "e4", "e4-512", "d2", "d3", "d4"]


def paper_prepare(batch):
    """Shared prep: depth to meters, 29x29 crop, per-image mean."""
    x = batch["image"]
    y = crop_to_bounding_box(batch["depth"] * 10.0, 17, 17, 29, 29)
    y_bar = jnp.mean(y, axis=(1, 2, 3), keepdims=True)
    return {"g_input": x, "y": y, "y_bar": y_bar}


def noise_site_generator(noise_layer: str = "x", e_bn: bool = False,
                         name: str = "generator") -> Layer:
    """paper_sampler generator: VALID skeleton with uniform[0,1) noise
    concatenated at one configurable site (paper_sampler.py:159-240)."""
    k = 5
    enc_ch = [64, 128, 256, 512]

    def init_fn(key, in_shape):
        n, h, w, c = in_shape
        p = _P(key, _X)
        cin = c + (1 if noise_layer == "x" else 0)
        for i, ch in enumerate(enc_ch):
            if noise_layer == f"e{i}":  # noise concat onto e_i's output
                cin += 1
            p.conv(f"e{i+1}", k, cin, ch)
            if e_bn:
                p.bn(f"e{i+1}", ch)
            cin = ch
        # decoder
        d1_in = 512 + (1 if noise_layer == "e4" else
                       512 if noise_layer == "e4-512" else 0)
        p.deconv("d1", k, d1_in, 256)
        d2_in = 256 + 256 + (1 if noise_layer == "d2" else 0)
        p.deconv("d2", k, d2_in, 128)
        d3_in = 128 + 128 + (1 if noise_layer == "d3" else 0)
        p.deconv("d3", k, d3_in, 64)
        d4_in = 64 + 64 + (1 if noise_layer == "d4" else 0)
        p.conv("d4", 1, d4_in, 1)
        p.state.setdefault("_", jnp.zeros(()))
        return p.params, p.state, (n, 29, 29, 1)

    def apply_fn(params, state, x, ctx: Ctx):
        n, h, w, _ = x.shape
        a = _A(params, state, ctx, e_bn)

        def noise(shape):
            return jax.random.uniform(ctx.next_rng(), shape,
                                      minval=0.0, maxval=1.0)

        sizes = [h]
        if noise_layer == "x":
            x = jnp.concatenate([x, noise((n, h, w, 1))], axis=-1)
        enc = []
        hcur = x
        for i in range(4):
            hcur = a.conv(f"e{i+1}", hcur, 2, "VALID", jax.nn.relu, bn=e_bn)
            sizes.append(hcur.shape[1])
            enc.append(hcur)  # skips are pre-noise (reference binds e_i
            #                   before the inline concat, paper_sampler.py:176)
            if noise_layer == f"e{i+1}" and i < 3:
                s = hcur.shape[1]
                hcur = jnp.concatenate([hcur, noise((n, s, s, 1))], axis=-1)
        y = enc[-1]
        if noise_layer == "e4":
            y = jnp.concatenate([y, noise((n, 1, 1, 1))], axis=-1)
        elif noise_layer == "e4-512":
            y = jnp.concatenate([y, noise((n, 1, 1, 512))], axis=-1)
        lr02 = lambda v: lrelu(v, 0.2)
        y = a.deconv("d1", y, (sizes[3], sizes[3]), 2, "VALID", lr02, bn=False)
        y = jnp.concatenate([y, enc[2]], axis=-1)
        if noise_layer == "d2":
            s = y.shape[1]
            y = jnp.concatenate([y, noise((n, s, s, 1))], axis=-1)
        y = a.deconv("d2", y, (sizes[2], sizes[2]), 2, "VALID", lr02, bn=False)
        y = jnp.concatenate([y, enc[1]], axis=-1)
        if noise_layer == "d3":
            s = y.shape[1]
            y = jnp.concatenate([y, noise((n, s, s, 1))], axis=-1)
        y = a.deconv("d3", y, (sizes[1], sizes[1]), 2, "VALID", lr02, bn=False)
        y = jnp.concatenate([y, enc[0]], axis=-1)
        if noise_layer == "d4":
            s = y.shape[1]
            y = jnp.concatenate([y, noise((n, s, s, 1))], axis=-1)
        y = a.conv("d4", y, 1, "SAME", None, bn=False)
        return y[:, :29, :29, :], a.new_state

    return Layer(init_fn, apply_fn, name)


def _adam_args():
    return {
        "--g_lr": dict(type=float, default=1e-4),
        "--d_lr": dict(type=float, default=1e-4),
        "--g_beta1": dict(type=float, default=0.5),
        "--d_beta1": dict(type=float, default=0.9),
        "--g_beta2": dict(type=float, default=0.999),
        "--d_beta2": dict(type=float, default=0.999),
    }


class PaperSampler(ConditionalGanBase):
    name = "paper_sampler"

    @staticmethod
    def arguments() -> dict:
        return {**_adam_args(),
                "--noise_layer": dict(type=str, choices=NOISE_SITES,
                                      default="x"),
                "--e_bn": dict(action="store_true", default=False)}

    # dataset-mean depth image (29x29, [0,1]); set by paper_train for the
    # y_mean baseline metrics (reference mean_image_placeholder)
    mean_image: np.ndarray | None = None

    @property
    def n_disc_train(self) -> int:
        return 1  # one D step, one G step (paper_sampler.py:154-157)

    def make_g_optimizer(self):
        a = self.args
        return optax.adam(a.g_lr, b1=a.g_beta1, b2=a.g_beta2)

    def make_d_optimizer(self):
        a = self.args
        return optax.adam(a.d_lr, b1=a.d_beta1, b2=a.d_beta2)

    def prepare(self, batch, ctx):
        return paper_prepare(batch)

    def build_nets(self, prep):
        return {
            "generator": noise_site_generator(
                getattr(self.args, "noise_layer", "x"),
                getattr(self.args, "e_bn", False)),
            "discriminator": two_path_disc(variant="paper", init=_X),
        }

    def transform_g(self, g, prep):
        return g + prep["y_bar"]  # mean-adjusted (paper_sampler.py:96-98)

    def d_forward(self, params, mstate, prep, depth, ctx):
        h, ms = self._nets["discriminator"].apply(
            params["discriminator"], mstate["discriminator"],
            (prep["g_input"], depth - prep["y_bar"]), ctx)
        return h, ms

    def d_init_shape(self, prep):
        return tuple(prep["g_input"].shape)

    def extra_losses(self, g, prep):
        return {"rmse": rmse(prep["y"], g)}

    def depth_range(self):
        return (0.0, 10.0)

    def write_summaries(self, writer, step, ts, batch) -> None:
        super().write_summaries(writer, step, ts, batch)
        # Eigen metric suite on /10 meters vs y_hat, zero-prediction, the
        # dataset mean image, and the sampler path (paper_sampler.py:304-342)
        g, prep = self._jit_predict(ts, batch)
        y = np.asarray(jax.device_get(prep["y"])) / 10.0
        y_bar = np.asarray(jax.device_get(prep["y_bar"])) / 10.0
        y_hat = np.asarray(jax.device_get(g)) / 10.0
        variants = {"y_hat": y_hat,
                    "y_0": np.broadcast_to(y_bar, y.shape)}
        if self.mean_image is not None:
            variants["y_mean"] = np.broadcast_to(
                self.mean_image[None, :, :, None], y.shape)
        g_s, prep_s = self._jit_sample(ts, batch,
                                       jax.random.fold_in(ts["rng"], step))
        variants["y_sampler"] = np.asarray(jax.device_get(g_s)) / 10.0
        y_s = np.asarray(jax.device_get(prep_s["y"])) / 10.0
        for name, pred in variants.items():
            target = y_s if name == "y_sampler" else y
            m = eigen_metrics(np.clip(target, 1e-3, None),
                              np.clip(pred, 1e-3, None))
            writer.scalars({f"metrics_{name}/{k}": float(v)
                            for k, v in m.items()}, step)


class PaperNoise(PaperSampler):
    """Ablation: input-noise-only mean-adjusted cGAN (paper_noise.py)."""
    name = "paper_noise"

    @staticmethod
    def arguments() -> dict:
        return {**_adam_args(),
                "--model_version": dict(type=str, default="baseline",
                                        choices=["baseline"])}

    def build_nets(self, prep):
        return {"generator": noise_site_generator("x", False),
                "discriminator": two_path_disc(variant="paper", init=_X)}


class PaperBaselineSampler(PaperCgan):
    """No-noise GAN baseline with model_version subset
    (paper_baseline_sampler.py)."""
    name = "paper_baseline_sampler"

    @staticmethod
    def arguments() -> dict:
        return {**_adam_args(),
                "--model_version": dict(type=str, default="baseline",
                                        choices=["baseline", "mean_adjusted",
                                                 "mean_provided"])}

    training_version = "gan"

    def make_g_optimizer(self):
        a = self.args
        return optax.adam(a.g_lr, b1=a.g_beta1, b2=a.g_beta2)

    def make_d_optimizer(self):
        a = self.args
        return optax.adam(a.d_lr, b1=a.d_beta1, b2=a.d_beta2)


class PaperStandalone(ModelPlugin):
    """Supervised generator (no discriminator), RMSE loss on /10 meters,
    model_version variants (paper_standalone.py)."""
    name = "paper_standalone"
    VERSIONS = ["baseline", "mean_adjusted", "mean_provided", "mean_provided2"]

    @staticmethod
    def arguments() -> dict:
        return {"--g_lr": dict(type=float, default=1e-4),
                "--g_beta1": dict(type=float, default=0.5),
                "--g_beta2": dict(type=float, default=0.999),
                "--model_version": dict(
                    type=str, default="baseline",
                    choices=PaperStandalone.VERSIONS)}

    mean_image: np.ndarray | None = None

    def __init__(self, args, mesh):
        super().__init__(args, mesh)
        self.optimizer = optax.adam(args.g_lr, b1=args.g_beta1,
                                    b2=args.g_beta2)
        self._net = None

    def _build(self):
        version = self.args.model_version
        return valid_unet(
            mean_at_e1=(version == "mean_provided"),
            final_activation=None, final_filter=1, final_crop=29, init=_X)

    def _g_forward(self, params, mstate, prep, ctx):
        version = self.args.model_version
        g_in = prep["g_input"]
        if version == "mean_provided":
            g_in = (g_in, prep["y_bar"])
        g, ms = self._net.apply(params, mstate, g_in, ctx)
        if version == "baseline":
            return g, ms
        return g + prep["y_bar"], ms

    def prepare(self, batch):
        prep = paper_prepare(batch)
        if self.args.model_version == "mean_provided2":
            x = prep["g_input"]
            ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
            prep["g_input"] = jnp.concatenate([x, ones], axis=-1)
        return prep

    def init_state(self, rng, sample_batch) -> dict:
        batch = {k: jnp.asarray(np.asarray(v)) for k, v in sample_batch.items()}
        prep = self.prepare(batch)
        self._net = self._build()
        params, mstate, _ = self._net.init(rng, tuple(prep["g_input"].shape))
        opt = self.optimizer.init(params)
        self._compile()
        return common.new_train_state(params, mstate, opt, self.args.seed,
                                      self.mesh)

    def _loss(self, y, y_hat):
        return rmse(y / 10.0, y_hat / 10.0)

    def depth_range(self):
        """G outputs are METERS [0,10] (paper_prepare scales depth x10) —
        without this, paper_fullimage's dataset-unit fallback (0,1) would
        compare meter-scale reconstructions against [0,1] ground truth
        (measured: scene rmse 4.7 instead of ~0.05)."""
        return (0.0, 10.0)

    def _compile(self):
        check = self.args.check_numerics

        def train_step(ts, batch):
            prep = self.prepare(batch)

            def loss_fn(params):
                ctx = Ctx(training=True, rng=common.step_rng(ts))
                y_hat, ms = self._g_forward(params, ts["mstate"], prep, ctx)
                return self._loss(prep["y"], y_hat), ms

            (loss, ms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                ts["params"])
            new_params, new_opt = common.apply_updates_group(
                self.optimizer, grads, ts["opt"], ts["params"])
            metrics = {"rmse": loss}
            if check:
                metrics["grad_finite"] = common.grad_finite_report(grads)
            return ({**ts, "params": new_params, "mstate": ms,
                     "opt": new_opt, "step": ts["step"] + 1}, metrics)

        def eval_step(ts, batch):
            prep = self.prepare(batch)
            ctx = Ctx(training=False, rng=common.step_rng(ts))
            y_hat, _ = self._g_forward(ts["params"], ts["mstate"], prep, ctx)
            return {"rmse": self._loss(prep["y"], y_hat)}

        def predict(ts, batch):
            prep = self.prepare(batch)
            ctx = Ctx(training=False, rng=common.step_rng(ts))
            y_hat, _ = self._g_forward(ts["params"], ts["mstate"], prep, ctx)
            return y_hat, prep

        self._jit_train = jit_step(train_step, self.mesh)
        self._jit_eval = jit_step(eval_step, self.mesh, donate_argnums=())
        self._jit_predict = jit_step(predict, self.mesh, donate_argnums=())

    def train(self, ts, stream):
        return self._jit_train(ts, next(stream))

    def eval_losses(self, ts, batch) -> dict:
        return self._jit_eval(ts, batch)

    def write_summaries(self, writer, step, ts, batch) -> None:
        from hemx.ops.images import colorize
        y_hat, prep = self._jit_predict(ts, batch)
        n = min(self.args.examples, np.asarray(y_hat).shape[0])
        y = np.asarray(jax.device_get(prep["y"])) / 10.0
        y_bar = np.asarray(jax.device_get(prep["y_bar"])) / 10.0
        pred = np.asarray(jax.device_get(y_hat)) / 10.0
        x = np.asarray(jax.device_get(batch["image"]))[:n]
        writer.montage("model/images", np.clip(x, 0, 1), step)
        writer.montage("model/real_depths", colorize(np.clip(y, 0, 1)[:n]), step)
        writer.montage("model/fake_depths", colorize(np.clip(pred, 0, 1)[:n]),
                       step)
        # y_0 baseline predictor: zeros for 'baseline' (y_0 = g_0 =
        # tf.zeros_like(g), paper_standalone.py:72-76); the mean_* versions
        # add y_bar (y_0 = g_0 + y_bar), i.e. the per-image-mean predictor
        version = getattr(self.args, "model_version", "baseline")
        y0 = (np.zeros_like(y) if version == "baseline"
              else np.broadcast_to(y_bar, y.shape))
        variants = {"y_hat": pred, "y_0": y0}
        if self.mean_image is not None:
            variants["y_mean"] = np.broadcast_to(
                self.mean_image[None, :, :, None], y.shape)
        for name, p in variants.items():
            m = eigen_metrics(np.clip(y, 1e-3, None), np.clip(p, 1e-3, None))
            writer.scalars({f"metrics_{name}/{k}": float(v)
                            for k, v in m.items()}, step)


class PaperBaselineStandalone(PaperStandalone):
    """Supervised RMSE-only baseline (paper_baseline_standalone.py) —
    baseline/mean_adjusted versions."""
    name = "paper_baseline_standalone"

    @staticmethod
    def arguments() -> dict:
        return {"--g_lr": dict(type=float, default=1e-4),
                "--g_beta1": dict(type=float, default=0.5),
                "--g_beta2": dict(type=float, default=0.999),
                "--model_version": dict(type=str, default="baseline",
                                        choices=["baseline", "mean_adjusted"])}
