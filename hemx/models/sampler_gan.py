"""Sampler GAN — conditional 65x65 RGB -> 31x31 depth
(reference: hem/models/sampler_gan.py).

Parity notes:
* inputs rescaled to [-1,1]; depth center-cropped by fraction 0.4769
  (65 -> 31 px) (sampler_gan.py:86-91);
* G: VALID 5x5 encoder 65->31->14->5->1 with a uniform-noise channel
  concatenated to the input, skip decoder to 31x31, 5x5 SAME tanh head;
  --garch large adds stride-1 refinement convs per stage
  (sampler_gan.py:145-218); xavier init;
* D (--darch): 'early' = one rgb conv + stride-1 depth conv, concat, conv
  chain to 1x1x512 logits (final conv h3 has activation=None — but inherits
  BN from the scope under --batch_norm_disc); 'late' = two full conv paths
  concat at 1x1 then 1x1-conv merge to 512 'logits' with the scope's lrelu
  AND BN applied, exactly as the reference does (sampler_gan.py:222-262);
  normal(0.02) init;
* losses: sigmoid-xent; rmse and l1 reported on [0,1]-rescaled depths
  (sampler_gan.py:268-300);
* train: one D step then one G step per call (sampler_gan.py:137-141).
"""

from __future__ import annotations

import jax.numpy as jnp

from hemx.models import depth_nets
from hemx.models.conditional import ConditionalGanBase
from hemx.ops import initializers
from hemx.ops.images import center_crop
from hemx.ops.losses import rmse


class SamplerGan(ConditionalGanBase):
    name = "sampler_gan"

    @staticmethod
    def arguments() -> dict:
        return {
            "--batch_norm_disc": dict(action="store_true", default=False),
            "--batch_norm_gen": dict(action="store_true", default=False),
            "--garch": dict(default="large", choices=["small", "large"]),
            "--darch": dict(default="early", choices=["early", "late"]),
            "--n_disc_train": dict(type=int, default=1),
        }

    def prepare(self, batch, ctx):
        x = 2.0 * (batch["image"] - 0.5)
        y = 2.0 * (batch["depth"] - 0.5)
        y = center_crop(y, 0.4769)
        return {"g_input": x, "y": y}

    def build_nets(self, prep):
        a = self.args
        return {
            "generator": depth_nets.valid_unet(
                noise_channel=True, garch=a.garch,
                use_batch_norm=a.batch_norm_gen,
                final_activation=jnp.tanh, final_filter=5,
                init=initializers.xavier_uniform),
            "discriminator": depth_nets.two_path_disc(
                variant=a.darch, use_batch_norm=a.batch_norm_disc,
                init=initializers.normal(0.02)),
        }

    def d_forward(self, params, mstate, prep, depth, ctx):
        h, ms = self._nets["discriminator"].apply(
            params["discriminator"], mstate["discriminator"],
            (prep["g_input"], depth), ctx)
        return h, ms

    def d_init_shape(self, prep):
        return tuple(prep["g_input"].shape)

    def extra_losses(self, g, prep):
        g01 = (g + 1.0) / 2.0
        y01 = (prep["y"] + 1.0) / 2.0
        return {"rmse": rmse(y01, g01),
                "l1": jnp.mean(jnp.abs(y01 - g01))}
