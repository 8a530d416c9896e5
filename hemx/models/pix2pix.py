"""pix2pix conditional GAN (reference: hem/models/pix2pix.py).

Parity notes:
* G: U-Net encoder (stride-2 4x4 convs, lrelu 0.2, channels 64..512) to a
  1x1 bottleneck, decoder with skip concats, tanh output; optional uniform
  noise at input/latent/end; dropout (keep-prob semantics) on the first 3
  decoder layers (pix2pix.py:160-230). Normal(0, 0.02) init throughout.
* D: PatchGAN over channel-concat (x, depth): 4 stride-2 convs + 1-channel
  conv producing patch logits; sigmoid folded into the loss
  (pix2pix.py:232-262).
* losses: sigmoid-xent GAN loss; optional L1 term with weight --lambda=10.
  DEVIATION: hemx honors a non-default --lambda; the reference declared the
  flag but hardcoded l_term=10.0 (pix2pix.py:286-289 — dead flag), so a
  reference config with --lambda != 10 trains differently here (correctly)
  computed on [0,1]-rescaled depths; l1 and rmse always reported
  (pix2pix.py:264-310).
* training: --n_disc_train D steps then one G step, each on a fresh batch
  (pix2pix.py:151-157).
* the reference's --skip_layers flag was dead (default 'false' string and
  never read — skips were unconditional); hemx makes skips unconditional
  too and omits the flag.
"""

from __future__ import annotations

import jax.numpy as jnp

from hemx.models import networks
from hemx.models.conditional import ConditionalGanBase
from hemx.ops.losses import rmse


class Pix2PixModel(ConditionalGanBase):
    name = "pix2pix"

    @staticmethod
    def arguments() -> dict:
        return {
            "--noise": dict(type=str, nargs="*",
                            choices=["input", "latent", "end"], default=[],
                            help="Inject uniform noise into the generator at "
                                 "these points (pix2pix.py:44-49)."),
            "--dropout": dict(type=float, default=0,
                              help="Keep-prob for dropout on early decoder "
                                   "layers (0 disables)."),
            "--batch_norm_disc": dict(action="store_true", default=False),
            "--batch_norm_gen": dict(action="store_true", default=False),
            "--n_disc_train": dict(type=int, default=1),
            "--add_l1": dict(action="store_true", default=False,
                             help="Add lambda*L1 to the generator loss."),
            "--lambda": dict(type=float, default=10.0, dest="l1_lambda"),
        }

    def build_nets(self, prep):
        a = self.args
        return {
            "generator": networks.unet(
                1, filter_size=4, bn_gen=a.batch_norm_gen,
                noise=getattr(a, "noise", []) or [],
                dropout_keep=getattr(a, "dropout", 0) or 0,
                init=networks.normal_init(0.02)),
            "discriminator": networks.patchgan(
                bn_disc=a.batch_norm_disc, init=networks.normal_init(0.02)),
        }

    def extra_g_loss(self, g, prep):
        g01 = (g + 1.0) / 2.0
        y01 = (prep["y"] + 1.0) / 2.0
        l1 = jnp.mean(jnp.abs(y01 - g01))
        lam = getattr(self.args, "l1_lambda", 10.0)
        add = lam * l1 if getattr(self.args, "add_l1", False) else 0.0
        return add, {"l1": l1}

    def extra_losses(self, g, prep):
        g01 = (g + 1.0) / 2.0
        y01 = (prep["y"] + 1.0) / 2.0
        return {"rmse": rmse(y01, g01)}
