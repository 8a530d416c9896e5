"""Thesis experiment 1 — conditional GAN with mean-depth model variants
(reference: hem/models/paper_cgan.py).

Parity notes:
* input prep (paper_cgan.py:84-99): x = 65x65 RGB as-is (NOT rescaled);
  depth y multiplied by 10 into real-world meters and cropped to the top-left
  29x29 of the 65x65 patch via crop_to_bounding_box(17,17,29,29); per-image
  mean y_bar;
* --model_version (paper_cgan.py:103-140):
  - baseline:        y_hat = G(x)
  - mean_adjusted:   y_hat = G(x) + y_bar  (G predicts the residual);
                     D sees (x, y - y_bar) vs (x, y_hat - y_bar)
  - mean_provided:   G receives y_bar as a constant channel at e1
  - mean_provided2:  G input gains a constant ONES channel (kept as the
                     reference wrote it — apparently meant to be *y_bar);
                     D's rgb path gains a y_bar channel
* G head: 1x1 linear conv, cropped 31->29 (paper_cgan.py:236-240);
* D: two-path rgb/depth discriminator merged by 1x1 convs
  (paper_cgan.py:318-389);
* --training_version wgan: RMSProp(g_lr) generator + Adam(d_lr) critic,
  weight clip +/-0.01 on BOTH G and D, 5 critic steps per G step
  (paper_cgan.py:64-69,180-189,200-205); 'gan' uses Adam both sides with
  separate lr/beta flags;
* depth montages/metrics operate in meters (depth_range (0, 10)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hemx.metrics.eigen import eigen_metrics
from hemx.models import depth_nets
from hemx.models.conditional import ConditionalGanBase
from hemx.ops import initializers
from hemx.ops.images import crop_to_bounding_box
from hemx.ops.losses import rmse


class PaperCgan(ConditionalGanBase):
    name = "paper_cgan"

    @staticmethod
    def arguments() -> dict:
        return {
            "--g_lr": dict(type=float, default=1e-4),
            "--d_lr": dict(type=float, default=1e-4),
            "--g_beta1": dict(type=float, default=0.5),
            "--d_beta1": dict(type=float, default=0.5),
            "--g_beta2": dict(type=float, default=0.999),
            "--d_beta2": dict(type=float, default=0.999),
            "--model_version": dict(type=str, default="baseline",
                                    choices=["baseline", "mean_adjusted",
                                             "mean_provided", "mean_provided2"]),
            "--training_version": dict(type=str, default="gan",
                                       choices=["gan", "wgan"]),
        }

    @property
    def n_disc_train(self) -> int:
        return 5 if self.training_version == "wgan" else 1

    def make_g_optimizer(self):
        a = self.args
        if getattr(a, "training_version", "gan") == "wgan":
            return optax.rmsprop(a.g_lr)
        return optax.adam(a.g_lr, b1=a.g_beta1, b2=a.g_beta2)

    def make_d_optimizer(self):
        a = self.args
        if getattr(a, "training_version", "gan") == "wgan":
            return optax.adam(a.d_lr)
        return optax.adam(a.d_lr, b1=a.d_beta1, b2=a.d_beta2)

    # ------------------------------------------------------------------ prep
    def prepare(self, batch, ctx):
        x = batch["image"]
        y = batch["depth"] * 10.0
        y = crop_to_bounding_box(y, 17, 17, 29, 29)
        y_bar = jnp.mean(y, axis=(1, 2, 3), keepdims=True)
        prep = {"g_input": x, "y": y, "y_bar": y_bar}
        if self.args.model_version == "mean_provided2":
            ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
            prep["g_input"] = jnp.concatenate([x, ones], axis=-1)
            prep["d_x"] = jnp.concatenate(
                [x, jnp.broadcast_to(y_bar, x.shape[:3] + (1,))], axis=-1)
        return prep

    def build_nets(self, prep):
        version = self.args.model_version
        gen = depth_nets.valid_unet(
            mean_at_e1=(version == "mean_provided"),
            final_activation=None, final_filter=1, final_crop=29,
            init=initializers.xavier_uniform)
        depth_extra = 1 if version in ("mean_provided", "mean_provided2") else 0
        rgb_extra = 1 if version == "mean_provided2" else 0
        disc = depth_nets.two_path_disc(
            variant="paper", depth_extra_channels=depth_extra,
            rgb_extra_channels=rgb_extra, init=initializers.xavier_uniform)
        return {"generator": gen, "discriminator": disc}

    # --------------------------------------------------------------- forward
    def g_init_input(self, prep):
        return prep["g_input"]

    def g_forward(self, params, mstate, prep, ctx):
        version = self.args.model_version
        g_in = prep["g_input"]
        if version == "mean_provided":
            g_in = (g_in, prep["y_bar"])
        g, ms = self._nets["generator"].apply(params["generator"],
                                              mstate["generator"], g_in, ctx)
        if version == "baseline":
            return g, ms
        return g + prep["y_bar"], ms  # mean-adjusted family

    def d_forward(self, params, mstate, prep, depth, ctx):
        version = self.args.model_version
        if version != "baseline":
            depth = depth - prep["y_bar"]
        if version in ("mean_provided", "mean_provided2"):
            bar = jnp.broadcast_to(prep["y_bar"], depth.shape)
            depth = jnp.concatenate([depth, bar], axis=-1)
        d_x = prep.get("d_x", prep["g_input"])
        h, ms = self._nets["discriminator"].apply(
            params["discriminator"], mstate["discriminator"], (d_x, depth),
            ctx)
        return h, ms

    def d_init_shape(self, prep):
        # two_path_disc takes the rgb shape; extra channels declared at build
        x = prep["g_input"]
        base_c = 3
        return (x.shape[0], x.shape[1], x.shape[2], base_c)

    def extra_losses(self, g, prep):
        return {"rmse": rmse(prep["y"], g)}

    def depth_range(self):
        return (0.0, 10.0)

    def eigen_metrics_for(self, ts, batch):
        """Eigen suite on /10-normalized meters (paper_metrics.py:12-35)."""
        import jax
        from hemx.metrics.eigen import eigen_metrics
        g, prep = self._jit_predict(ts, batch)
        y = jax.device_get(prep["y"]) / 10.0
        y_hat = jax.device_get(g) / 10.0
        return {k: float(v) for k, v in eigen_metrics(y, y_hat).items()}

    # dataset-mean depth image (29x29, [0,1]); set by paper_train for the
    # y_mean baseline metrics (reference mean_image_placeholder)
    mean_image = None

    def write_summaries(self, writer, step, ts, batch) -> None:
        """Base GAN summaries + the reference's per-step Eigen metric
        scalars vs y_hat / y_0 / y_mean (paper_cgan.py:175-177) — the
        tags paper_visualize's experiment presets read
        (metrics_y_hat/linear_rmse)."""
        super().write_summaries(writer, step, ts, batch)
        g, prep = self._jit_predict(ts, batch)
        y = np.asarray(jax.device_get(prep["y"])) / 10.0
        y_bar = np.asarray(jax.device_get(prep["y_bar"])) / 10.0
        y_hat = np.asarray(jax.device_get(g)) / 10.0
        # y_0 = zeros for baseline, the per-image mean for the mean_*
        # versions (paper_cgan.py:104-121: y_0 = g_0 [+ y_bar])
        version = getattr(self.args, "model_version", "baseline")
        y0 = (np.zeros_like(y) if version == "baseline"
              else np.broadcast_to(y_bar, y.shape))
        variants = {"y_hat": y_hat, "y_0": y0}
        if self.mean_image is not None:
            variants["y_mean"] = np.broadcast_to(
                self.mean_image[None, :, :, None], y.shape)
        for name, pred in variants.items():
            m = eigen_metrics(np.clip(y, 1e-3, None),
                              np.clip(pred, 1e-3, None))
            writer.scalars({f"metrics_{name}/{k}": float(v)
                            for k, v in m.items()}, step)
