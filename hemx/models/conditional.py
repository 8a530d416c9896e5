"""Shared machinery for the conditional-GAN (image -> depth) model zoo.

Every v2 depth model follows one skeleton (reference: hem/models/pix2pix.py,
sampler_gan.py, improved_sampler.py, paper_cgan.py, paper_sampler.py, ...):
prepare (x, y) pairs -> G predicts depth -> D scores (x, depth) pairs ->
sigmoid-xent (or Wasserstein) losses -> alternating D/G updates -> sampler
diagnostics (one image repeated B times to visualize the conditional
distribution). The reference repeats ~400 lines per model; hemx factors the
skeleton here and lets each plugin supply architectures + loss config.

Subclass contract:
* ``build_nets(prep_shapes) -> {"generator": Layer, "discriminator": Layer}``
  — the discriminator Layer consumes ``concat([x_d, y], channel_axis)``
  unless ``d_forward`` is overridden;
* ``prepare(batch, ctx) -> dict`` with at least ``g_input`` (G's input,
  NHWC) and ``y`` (target depth in G's output range); optional ``d_x``
  (D's conditioning input, defaults to g_input);
* optionally override ``transform_g``, ``extra_g_loss``, ``d_forward``.

Training regimes (reference: paper_cgan.py:64-69,180-210): ``gan`` =
sigmoid-xent + n_disc_train; ``wgan`` = Wasserstein + weight clip +/-0.01
on D + n_disc_train critic steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hemx.core import Ctx
from hemx.models import common
from hemx.models.plugin import ModelPlugin
from hemx.ops import losses as L
from hemx.parallel.dp import jit_step
from hemx.train.optimizers import clip_params, init_optimizer


class ConditionalGanBase(ModelPlugin):
    training_version = "gan"   # or "wgan"
    clip_value = 0.01
    clip_generator = True  # wgan mode clips G too (paper_cgan.py:180-189)

    def __init__(self, args, mesh):
        super().__init__(args, mesh)
        self.training_version = getattr(args, "training_version",
                                        type(self).training_version)
        self.g_optimizer = self.make_g_optimizer()
        self.d_optimizer = self.make_d_optimizer()
        self._nets = None

    def make_g_optimizer(self):
        return init_optimizer(self.args)

    def make_d_optimizer(self):
        return init_optimizer(self.args)

    # ------------------------------------------------------------------ hooks
    def build_nets(self, prep: dict) -> dict:
        raise NotImplementedError

    def prepare(self, batch: dict, ctx: Ctx) -> dict:
        """Split/scale the input batch. Default: x=image in [-1,1],
        y=depth in [-1,1] (reference: pix2pix.py:102-104)."""
        return {"g_input": 2.0 * (batch["image"] - 0.5),
                "y": 2.0 * (batch["depth"] - 0.5)}

    def transform_g(self, g, prep: dict):
        """Post-process raw G output into the depth estimate (e.g.
        mean-adjusted residual models add the mean back)."""
        return g

    def extra_g_loss(self, g, prep: dict):
        """Additional generator loss terms (L1, RMSE, sparsity...). Returns
        (value, {name: scalar}) — value is added to the GAN loss."""
        return 0.0, {}

    def extra_losses(self, g, prep: dict) -> dict:
        """Metrics reported but not optimized (e.g. rmse)."""
        return {}

    def g_forward(self, params, mstate, prep, ctx):
        g, ms = self._nets["generator"].apply(params["generator"],
                                              mstate["generator"],
                                              prep["g_input"], ctx)
        return self.transform_g(g, prep), ms

    def d_forward(self, params, mstate, prep, depth, ctx):
        """Score a (conditioning, depth) pair. Default: channel-concat."""
        d_x = prep.get("d_x", prep["g_input"])
        pair = jnp.concatenate([d_x, depth], axis=-1)
        h, ms = self._nets["discriminator"].apply(params["discriminator"],
                                                  mstate["discriminator"],
                                                  pair, ctx)
        return h, ms

    def d_init_shape(self, prep: dict):
        """Shape passed to discriminator.init (default: the channel-concat)."""
        d_x = prep.get("d_x", prep["g_input"])
        return tuple(d_x.shape[:-1]) + (d_x.shape[-1] + prep["y"].shape[-1],)

    def g_init_input(self, prep: dict):
        """Input (or shape source) for generator.init."""
        return prep["g_input"]

    # --------------------------------------------------------------- plumbing
    def init_state(self, rng, sample_batch) -> dict:
        batch = {k: jnp.asarray(np.asarray(v)) for k, v in sample_batch.items()}
        prep = self.prepare(batch, Ctx(training=False,
                                       rng=jax.random.PRNGKey(0)))
        self._nets = self.build_nets(prep)
        kg, kd = jax.random.split(rng)
        g_in = self.g_init_input(prep)
        g_in_shape = tuple(g_in[0].shape if isinstance(g_in, tuple)
                           else g_in.shape)
        gp, gs, g_out = self._nets["generator"].init(kg, g_in_shape)
        dp, ds, _ = self._nets["discriminator"].init(kd, self.d_init_shape(prep))
        params = {"generator": gp, "discriminator": dp}
        mstate = {"generator": gs, "discriminator": ds}
        opt = {"g": self.g_optimizer.init(gp), "d": self.d_optimizer.init(dp)}
        self._compile()
        return common.new_train_state(params, mstate, opt, self.args.seed,
                                      self.mesh)

    def _g_loss_from_fake(self, fake_logits):
        """Generator loss from the fake logits alone (the only thing g_loss
        depends on in both regimes — kept as its own helper so the g_step
        never has to fabricate a 'real' argument)."""
        if self.training_version == "wgan":
            return L.wgan_g_loss(fake_logits)
        return jnp.mean(L.sigmoid_xent(fake_logits,
                                       jnp.ones_like(fake_logits)))

    def _gan_losses(self, real_logits, fake_logits):
        g_loss = self._g_loss_from_fake(fake_logits)
        if self.training_version == "wgan":
            d_real = -jnp.mean(real_logits)
            d_fake = jnp.mean(fake_logits)
        else:
            d_real = jnp.mean(L.sigmoid_xent(real_logits,
                                             jnp.ones_like(real_logits)))
            d_fake = jnp.mean(L.sigmoid_xent(fake_logits,
                                             jnp.zeros_like(fake_logits)))
        d_loss = d_real + d_fake
        return g_loss, d_loss, d_real, d_fake

    def _pin_dp(self, batch):
        """Spatial meshes: reshard the batch to the data-parallel layout at
        step entry, so the whole conditional-GAN step runs DP internally
        (no-op on meshes without a 'spatial' axis). The conditional
        families' G consumes the IMAGE as input, so spatial sharding flows
        through its encoder-deconv backward — where XLA's SPMD partitioner
        produces wrong generator grads (measured: pix2pix g_grad_norm 19.3
        vs 4.46 single-device while every loss matches; DP-pinned: exact;
        the unconditional GANs' G takes a replicated latent and never hits
        this, hemx/models/gan.py pins only its critic closures). One
        all-to-all per step; spatial scaling currently benefits cnn and the
        unconditional GAN family (TestSpatialParallel)."""
        return jax.tree_util.tree_map(
            lambda v: common.pin_batch_sharding(v, self.mesh, spatial=False),
            batch)

    def _compile(self):
        check = self.args.check_numerics

        def d_step(ts, batch):
            # split_step_rng: each critic iteration (step counter unchanged)
            # must see fresh noise/crops — see common.split_step_rng.
            rng, new_base = common.split_step_rng(ts)
            batch = self._pin_dp(batch)
            prep = self.prepare(batch, Ctx(training=True, rng=rng))

            def loss_fn(dp):
                params = {**ts["params"], "discriminator": dp}
                ctx = Ctx(training=True, rng=rng)
                g, _ = self.g_forward(params, ts["mstate"], prep, ctx)
                real_logits, ms1 = self.d_forward(params, ts["mstate"], prep,
                                                  prep["y"], ctx)
                fake_logits, ms2 = self.d_forward(
                    params, {**ts["mstate"], "discriminator": ms1}, prep, g,
                    Ctx(training=True, rng=rng))
                _, d_loss, d_real, d_fake = self._gan_losses(real_logits,
                                                             fake_logits)
                return d_loss, (ms2, d_real, d_fake)

            (d_loss, (ms_d, d_real, d_fake)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(ts["params"]["discriminator"])
            new_d, new_opt_d = common.apply_updates_group(
                self.d_optimizer, grads, ts["opt"]["d"],
                ts["params"]["discriminator"])
            if self.training_version == "wgan":
                new_d = clip_params(new_d, self.clip_value)
            metrics = {"d_loss": d_loss, "d_real": d_real,
                       "d_fake": d_fake,
                       "d_grad_norm": common.grad_norm(grads)}
            if check:
                metrics["grad_finite"] = common.grad_finite_report({"d": grads})
            new_ts = {**ts,
                      "params": {**ts["params"], "discriminator": new_d},
                      "mstate": {**ts["mstate"], "discriminator": ms_d},
                      "opt": {**ts["opt"], "d": new_opt_d},
                      "step": ts["step"],
                      "rng": new_base}
            return new_ts, metrics

        def g_step(ts, batch):
            rng, new_base = common.split_step_rng(ts)
            batch = self._pin_dp(batch)
            prep = self.prepare(batch, Ctx(training=True, rng=rng))

            def loss_fn(gp):
                params = {**ts["params"], "generator": gp}
                ctx = Ctx(training=True, rng=rng)
                g, ms_g = self.g_forward(params, ts["mstate"], prep, ctx)
                fake_logits, _ = self.d_forward(params, ts["mstate"], prep, g,
                                                Ctx(training=True, rng=rng))
                g_gan = self._g_loss_from_fake(fake_logits)
                extra, extra_metrics = self.extra_g_loss(g, prep)
                g_total = g_gan + extra
                return g_total, (ms_g, g, g_gan, extra_metrics)

            (g_total, (ms_g, g, g_gan, extra_metrics)), grads = \
                jax.value_and_grad(loss_fn, has_aux=True)(
                    ts["params"]["generator"])
            new_g, new_opt_g = common.apply_updates_group(
                self.g_optimizer, grads, ts["opt"]["g"],
                ts["params"]["generator"])
            if self.training_version == "wgan" and self.clip_generator:
                new_g = clip_params(new_g, self.clip_value)
            metrics = {"g_loss": g_total, "g_gan": g_gan,
                       "g_grad_norm": common.grad_norm(grads),
                       **extra_metrics, **self.extra_losses(g, prep)}
            if check:
                metrics["grad_finite"] = common.grad_finite_report({"g": grads})
            new_ts = {**ts,
                      "params": {**ts["params"], "generator": new_g},
                      "mstate": {**ts["mstate"], "generator": ms_g},
                      "opt": {**ts["opt"], "g": new_opt_g},
                      "step": ts["step"] + 1,
                      "rng": new_base}
            return new_ts, metrics

        def eval_step(ts, batch):
            rng = common.step_rng(ts)
            ctx = Ctx(training=True, rng=rng)
            prep = self.prepare(batch, ctx)
            g, _ = self.g_forward(ts["params"], ts["mstate"], prep, ctx)
            real_logits, _ = self.d_forward(ts["params"], ts["mstate"], prep,
                                            prep["y"], ctx)
            fake_logits, _ = self.d_forward(ts["params"], ts["mstate"], prep, g,
                                            ctx)
            g_gan, d_loss, d_real, d_fake = self._gan_losses(real_logits,
                                                             fake_logits)
            extra, extra_metrics = self.extra_g_loss(g, prep)
            return {"g_loss": g_gan + extra, "d_loss": d_loss,
                    **extra_metrics, **self.extra_losses(g, prep)}

        def predict(ts, batch):
            rng = common.step_rng(ts)
            ctx = Ctx(training=True, rng=rng)
            prep = self.prepare(batch, ctx)
            g, _ = self.g_forward(ts["params"], ts["mstate"], prep, ctx)
            return g, prep

        def sample(ts, batch, rng):
            """Sampler path: repeat sample 0 across the batch to expose the
            conditional distribution (reference: pix2pix.py:106-113)."""
            ctx = Ctx(training=True, rng=rng)
            rep = {k: jnp.repeat(v[:1], v.shape[0], axis=0)
                   for k, v in batch.items()}
            prep = self.prepare(rep, ctx)
            g, _ = self.g_forward(ts["params"], ts["mstate"], prep, ctx)
            return g, prep

        def capture(ts, batch):
            """Per-layer activation stats (G and D forward) for
            --summarize_activations; 8 rows, stats reduced on-device."""
            small = {k: v[:8] for k, v in batch.items()}
            rng = common.step_rng(ts)
            ctx_g = Ctx(training=True, rng=rng, capture=True)
            prep = self.prepare(small, ctx_g)
            g, _ = self.g_forward(ts["params"], ts["mstate"], prep, ctx_g)
            acts = {f"generator/{k}": v
                    for k, v in ctx_g.intermediates.items()}
            ctx_d = Ctx(training=True, rng=rng, capture=True)
            self.d_forward(ts["params"], ts["mstate"], prep, prep["y"], ctx_d)
            acts.update({f"discriminator/{k}": v
                         for k, v in ctx_d.intermediates.items()})
            return common.summarizable_stats(acts)

        def report_grads(ts, batch):
            """Per-variable D and G gradient stats for --summarize_gradients."""
            rng = common.step_rng(ts)
            batch = self._pin_dp(batch)  # grads: same pin as the train steps
            prep = self.prepare(batch, Ctx(training=True, rng=rng))

            def d_loss_fn(dp):
                params = {**ts["params"], "discriminator": dp}
                ctx = Ctx(training=True, rng=rng)
                g, _ = self.g_forward(params, ts["mstate"], prep, ctx)
                real_logits, _ = self.d_forward(params, ts["mstate"], prep,
                                                prep["y"], ctx)
                fake_logits, _ = self.d_forward(params, ts["mstate"], prep, g,
                                                Ctx(training=True, rng=rng))
                _, d_loss, _, _ = self._gan_losses(real_logits, fake_logits)
                return d_loss

            def g_loss_fn(gp):
                params = {**ts["params"], "generator": gp}
                ctx = Ctx(training=True, rng=rng)
                g, _ = self.g_forward(params, ts["mstate"], prep, ctx)
                fake_logits, _ = self.d_forward(params, ts["mstate"], prep, g,
                                                Ctx(training=True, rng=rng))
                extra, _ = self.extra_g_loss(g, prep)
                return self._g_loss_from_fake(fake_logits) + extra

            d_grads = jax.grad(d_loss_fn)(ts["params"]["discriminator"])
            g_grads = jax.grad(g_loss_fn)(ts["params"]["generator"])
            return common.summarizable_stats(
                {"discriminator": d_grads, "generator": g_grads})

        self._jit_d = jit_step(d_step, self.mesh)
        self._jit_g = jit_step(g_step, self.mesh)
        self._jit_eval = jit_step(eval_step, self.mesh, donate_argnums=())
        self._jit_predict = jit_step(predict, self.mesh, donate_argnums=())
        self._jit_sample = jit_step(sample, self.mesh, donate_argnums=(),
                                    batch_argnums=(1,))
        self._jit_capture = jit_step(capture, self.mesh, donate_argnums=())
        self._jit_grad_report = jit_step(report_grads, self.mesh,
                                         donate_argnums=())

    # ------------------------------------------------------------------- API
    @property
    def n_disc_train(self) -> int:
        return getattr(self.args, "n_disc_train", 1)

    def batches_per_train_call(self) -> int:
        return self.n_disc_train + 1

    def train(self, ts, stream):
        for _ in range(self.n_disc_train):
            ts, d_metrics = self._jit_d(ts, next(stream))
        ts, g_metrics = self._jit_g(ts, next(stream))
        return ts, {**d_metrics, **g_metrics}

    def eval_losses(self, ts, batch) -> dict:
        return self._jit_eval(ts, batch)

    def capture_activations(self, ts, batch):
        return self._jit_capture(ts, batch)

    def grad_report(self, ts, batch):
        return self._jit_grad_report(ts, batch)

    # --------------------------------------------------------------- summaries
    def depth_range(self):
        """(lo, hi) of G outputs for montage rescaling."""
        return (-1.0, 1.0)

    def write_summaries(self, writer, step, ts, batch) -> None:
        n = min(self.args.examples, next(iter(batch.values())).shape[0])
        g, prep = self._jit_predict(ts, batch)
        g_s, prep_s = self._jit_sample(ts, batch,
                                       jax.random.fold_in(ts["rng"], step))
        lo, hi = self.depth_range()

        def norm(a):
            return np.clip((np.asarray(jax.device_get(a)) - lo) / (hi - lo),
                           0, 1)

        from hemx.ops.images import colorize
        x_img = np.asarray(jax.device_get(batch["image"]))[:n]
        writer.montage("model/images", np.clip(x_img, 0, 1), step)
        writer.montage("model/real_depths", colorize(norm(prep["y"])[:n]), step)
        writer.montage("model/fake_depths", colorize(norm(g)[:n]), step)
        writer.montage("sampler/fake_depths", colorize(norm(g_s)[:n]), step)
        # sampler variance diagnostics (reference: sampler_gan.py:366-384)
        gs = norm(g_s)
        writer.scalar("sampler/sample_variance", float(gs.var(axis=0).mean()),
                      step)
        y_s = norm(prep_s["y"])[0]
        l2 = ((gs - y_s) ** 2).reshape(gs.shape[0], -1).sum(axis=1)
        writer.scalar("sampler/mean_sample_l2", float(l2.mean()), step)
        writer.scalar("sampler/min_sample_l2", float(l2.min()), step)
