"""Improved sampler — the thesis workhorse with 8 generator and 6
discriminator architectures (reference: hem/models/improved_sampler.py).

Architectures are expressed as specs over one spec-driven builder instead of
the reference's eight near-identical 40-line functions:

Generators (improved_sampler.py:262-540; all concat a uniform-noise channel
to the input):
* A1 — VALID 5x5 65->31->14->5->1; BN on all convs except e1 (incl. the
  final 1x1 tanh conv, per the decoder arg_scope)
* A2 — as A1, BN only on e2/e3
* A3 — as A1, no BN
* B1 — VALID filters (5,4,3,6) over 66 px; target crop 31
* B2 — SAME 5x5 over 64 px, 5 stages (last VALID 4x4 to 1x1x1024); crop 32
* C1 — B1 + x_loc/y_loc input channels
* D1 — B2 + x_loc/y_loc input channels
* E1 — B2 + x_loc/y_loc/mean-distance channels

Discriminators (improved_sampler.py:638-808): two-path rgb/depth conv stacks
merged by 1x1 convs — A1 (VALID 5x5, 31px depth), B1/C1 (VALID mixed
filters, 66px rgb), B2/D1/E1 (SAME 5x5, 64px rgb / 32px depth, 6-deep 1x1
merge).

Input prep (improved_sampler.py:110-181): arch-dependent target crops
(center 0.4769 -> 31 for A*, bounding boxes for B/C/D/E) and conditioning
channels. Diagnostic paths built per step for summaries
(improved_sampler.py:204-209): g_sampler (one image repeated), g_shuffle
(shuffled x against unshuffled y), g_noise (pure uniform-noise input).

Loss (improved_sampler.py:912-952): sigmoid-xent GAN loss; --g_sparsity
subtracts the e5/bottleneck zero-fraction (non-differentiable in the
reference too — stop_gradient makes that explicit); --g_rmse adds the RMSE
term. rmse/l1 always reported on [0,1] depths.

Training (improved_sampler.py:252-258): one fused call runs the D update
and G update on the SAME batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hemx.core import Ctx, Layer
from hemx.models import common
from hemx.models.conditional import ConditionalGanBase
from hemx.models.depth_nets import _A, _P
from hemx.ops import initializers
from hemx.ops.activations import lrelu
from hemx.ops.images import center_crop, crop_to_bounding_box
from hemx.ops.losses import rmse

_X = initializers.xavier_uniform


def _lrelu02(x):
    return lrelu(x, 0.2)


# (filter, out_ch, padding, bn) per stride-2 encoder stage
# (filter, out_ch, bn) per stride-2 decoder stage (targets mirror encoder)
GEN_SPECS = {
    "A1": dict(enc=[(5, 64, "VALID", False), (5, 128, "VALID", True),
                    (5, 256, "VALID", True), (5, 512, "VALID", True)],
               dec=[(5, 256, True), (5, 128, True), (5, 64, True)],
               final_bn=True),
    "A2": dict(enc=[(5, 64, "VALID", False), (5, 128, "VALID", True),
                    (5, 256, "VALID", True), (5, 512, "VALID", False)],
               dec=[(5, 256, False), (5, 128, False), (5, 64, False)],
               final_bn=False),
    "A3": dict(enc=[(5, 64, "VALID", False), (5, 128, "VALID", False),
                    (5, 256, "VALID", False), (5, 512, "VALID", False)],
               dec=[(5, 256, False), (5, 128, False), (5, 64, False)],
               final_bn=False),
    "B1": dict(enc=[(5, 64, "VALID", False), (4, 128, "VALID", False),
                    (3, 256, "VALID", False), (6, 512, "VALID", False)],
               dec=[(6, 256, False), (3, 128, False), (4, 64, False)],
               final_bn=False),
    "B2": dict(enc=[(5, 64, "SAME", False), (5, 128, "SAME", False),
                    (5, 256, "SAME", False), (5, 512, "SAME", False),
                    (4, 1024, "VALID", False)],
               dec=[(4, 512, False), (5, 256, False), (5, 128, False),
                    (5, 64, False)],
               final_bn=False),
}
GEN_SPECS["C1"] = dict(GEN_SPECS["B1"],
                       dec=[(6, 256, False), (3, 128, False), (4, 64, True)])
GEN_SPECS["D1"] = GEN_SPECS["B2"]
GEN_SPECS["E1"] = GEN_SPECS["B2"]

# rgb/depth path stages: (filter, out_ch, padding); combined: channel list
DISC_SPECS = {
    "A1": dict(rgb=[(5, 64, "VALID"), (5, 128, "VALID"), (5, 256, "VALID"),
                    (5, 512, "VALID")],
               depth=[(5, 128, "VALID"), (5, 256, "VALID"), (5, 512, "VALID")],
               combined=[1024, 512, 1]),
    "B1": dict(rgb=[(5, 64, "VALID"), (4, 128, "VALID"), (3, 256, "VALID"),
                    (6, 512, "VALID")],
               depth=[(4, 128, "VALID"), (3, 256, "VALID"), (6, 512, "VALID")],
               combined=[1024, 512, 1]),
    "B2": dict(rgb=[(5, 64, "SAME"), (5, 128, "SAME"), (5, 256, "SAME"),
                    (5, 512, "SAME"), (4, 1024, "VALID")],
               depth=[(5, 128, "SAME"), (5, 256, "SAME"), (5, 512, "SAME"),
                      (4, 1024, "VALID")],
               combined=[1024, 512, 256, 128, 64, 1]),
}
DISC_SPECS["C1"] = DISC_SPECS["B1"]
DISC_SPECS["D1"] = DISC_SPECS["B2"]
DISC_SPECS["E1"] = DISC_SPECS["B2"]

# target depth crop per generator arch (improved_sampler.py:110-181)
CROPS = {"A1": None, "A2": None, "A3": None,        # center_crop 0.4769
         "B1": (17, 17, 31), "C1": (17, 17, 31),
         "B2": (16, 16, 32), "D1": (16, 16, 32), "E1": (16, 16, 32)}
# extra conditioning channels per arch
EXTRAS = {"C1": ("x_loc", "y_loc"), "D1": ("x_loc", "y_loc"),
          "E1": ("x_loc", "y_loc", "mean")}


def _conv_out(size, k, s, pad):
    return -(-size // s) if pad == "SAME" else (size - k) // s + 1


def spec_generator(spec: dict, name: str = "generator") -> Layer:
    """Noise-channel encoder/decoder with skip concats from a spec."""
    enc, dec, final_bn = spec["enc"], spec["dec"], spec["final_bn"]

    def init_fn(key, in_shape):
        n, h, w, c = in_shape
        p = _P(key, _X)
        cin = c + 1  # noise channel
        sizes = [h]
        for i, (k, ch, pad, bn) in enumerate(enc):
            p.conv(f"e{i+1}", k, cin, ch)
            if bn:
                p.bn(f"e{i+1}", ch)
            sizes.append(_conv_out(sizes[-1], k, 2, pad))
            cin = ch
        for i, (k, ch, bn) in enumerate(dec):
            p.deconv(f"d{i+1}", k, cin, ch)
            if bn:
                p.bn(f"d{i+1}", ch)
            cin = ch + enc[len(enc) - 2 - i][1]  # skip concat
        p.conv("final", 1, cin, 1)
        if final_bn:
            p.bn("final", 1)
        p.state.setdefault("_", jnp.zeros(()))
        return p.params, p.state, (n, sizes[1], sizes[1], 1)

    def apply_fn(params, state, x, ctx: Ctx):
        n, h, w, _ = x.shape
        a = _A(params, state, ctx, False)
        z = jax.random.uniform(ctx.next_rng(), (n, h, w, 1),
                               minval=-1.0, maxval=1.0)
        hcur = jnp.concatenate([x, z], axis=-1)
        sizes = [h]
        skips = []
        for i, (k, ch, pad, bn) in enumerate(enc):
            hcur = a.conv(f"e{i+1}", hcur, 2, pad, jax.nn.relu, bn=bn)
            sizes.append(hcur.shape[1])
            skips.append(hcur)
            if i == len(enc) - 1:
                ctx.record("e_bottleneck", hcur)
        y = hcur
        for i, (k, ch, bn) in enumerate(dec):
            target = sizes[len(enc) - 1 - i]
            # deconv d_{i+1} undoes encoder stage len(enc)-i, so it uses that
            # stage's padding mode (B2's d1 is the VALID 4x4 undoing e5)
            pad = enc[len(enc) - 1 - i][2]
            y = a.deconv(f"d{i+1}", y, (target, target), 2, pad, _lrelu02,
                         bn=bn)
            y = jnp.concatenate([y, skips[len(enc) - 2 - i]], axis=-1)
        y = a.conv("final", y, 1, "SAME", None, bn=final_bn)
        return jnp.tanh(y), a.new_state

    return Layer(init_fn, apply_fn, name)


def spec_discriminator(spec: dict, name: str = "discriminator") -> Layer:
    rgb, depth, combined = spec["rgb"], spec["depth"], spec["combined"]

    def init_fn(key, in_shape):
        n, h, w, c = in_shape
        p = _P(key, _X)
        cin = c
        for i, (k, ch, pad) in enumerate(rgb):
            p.conv(f"hx{i+1}", k, cin, ch)
            cin = ch
        rgb_out = cin
        cin = 1
        for i, (k, ch, pad) in enumerate(depth):
            p.conv(f"hy{i+1}", k, cin, ch)
            cin = ch
        cin = rgb_out + cin
        for i, ch in enumerate(combined):
            p.conv(f"h{i+1}", 1, cin, ch)
            cin = ch
        p.state.setdefault("_", jnp.zeros(()))
        return p.params, p.state, (n, 1, 1, 1)

    def apply_fn(params, state, xy, ctx: Ctx):
        x, d = xy
        a = _A(params, state, ctx, False)
        h1 = x
        for i, (k, ch, pad) in enumerate(rgb):
            h1 = a.conv(f"hx{i+1}", h1, 2, pad, _lrelu02, bn=False)
        h2 = d
        for i, (k, ch, pad) in enumerate(depth):
            h2 = a.conv(f"hy{i+1}", h2, 2, pad, _lrelu02, bn=False)
        h = jnp.concatenate([h1, h2], axis=-1)
        for i, ch in enumerate(combined):
            act = None if i == len(combined) - 1 else _lrelu02
            h = a.conv(f"h{i+1}", h, 1, "SAME", act, bn=False)
        return h, a.new_state

    return Layer(init_fn, apply_fn, name)


class ImprovedSampler(ConditionalGanBase):
    name = "improved_sampler"

    @staticmethod
    def arguments() -> dict:
        return {
            "--g_sparsity": dict(action="store_true", default=False,
                                 help="Subtract the bottleneck zero-fraction "
                                      "from the generator loss."),
            "--g_rmse": dict(action="store_true", default=False,
                             help="Add an RMSE term to the generator loss."),
            "--g_arch": dict(type=str, default="A1",
                             choices=sorted(GEN_SPECS)),
            "--d_arch": dict(type=str, default="A1",
                             choices=sorted(DISC_SPECS)),
        }

    def prepare(self, batch, ctx):
        arch = self.args.g_arch
        x = 2.0 * (batch["image"] - 0.5)
        y = 2.0 * (batch["depth"] - 0.5)
        crop = CROPS[arch]
        if crop is None:
            y = center_crop(y, 0.4769)
        else:
            oy, ox, size = crop
            y = crop_to_bounding_box(y, oy, ox, size, size)
        for key in EXTRAS.get(arch, ()):
            x = jnp.concatenate([x, batch[key]], axis=-1)
        return {"g_input": x, "y": y, "d_x": x}

    def build_nets(self, prep):
        return {"generator": spec_generator(GEN_SPECS[self.args.g_arch]),
                "discriminator": spec_discriminator(DISC_SPECS[self.args.d_arch])}

    def g_forward(self, params, mstate, prep, ctx):
        if getattr(self.args, "g_sparsity", False):
            # Capture the encoder bottleneck for the sparsity term
            # (improved_sampler.py:910-922). The stash is a trace-time side
            # channel: g_forward and extra_g_loss run sequentially inside the
            # same jitted loss_fn trace, so the tracer is always fresh. A
            # plain method override (not a self.g_forward rebind) keeps
            # repeated _compile()/init_state() calls safe.
            ctx.capture = True
        g, ms = self._nets["generator"].apply(params["generator"],
                                              mstate["generator"],
                                              prep["g_input"], ctx)
        if getattr(self.args, "g_sparsity", False):
            self._last_bottleneck = ctx.intermediates.get("e_bottleneck", g)
        return g, ms

    def d_forward(self, params, mstate, prep, depth, ctx):
        h, ms = self._nets["discriminator"].apply(
            params["discriminator"], mstate["discriminator"],
            (prep["d_x"], depth), ctx)
        return h, ms

    def d_init_shape(self, prep):
        return tuple(prep["d_x"].shape)

    def extra_g_loss(self, g, prep):
        total = 0.0
        metrics = {}
        g01 = (g + 1.0) / 2.0
        y01 = (prep["y"] + 1.0) / 2.0
        r = rmse(y01, g01)
        metrics["rmse"] = r
        metrics["l1"] = jnp.mean(jnp.abs(y01 - g01))
        if getattr(self.args, "g_rmse", False):
            total = total + r
        if getattr(self.args, "g_sparsity", False):
            bott = self._last_bottleneck
            sparsity = jax.lax.stop_gradient(
                jnp.mean((bott == 0.0).astype(jnp.float32)))
            metrics["sparsity_term"] = sparsity
            total = total - 1.0 * sparsity
        return total, metrics

    def train(self, ts, stream):
        """One fused batch: D update and G update from the same batch
        (improved_sampler.py:252-258 single sess.run)."""
        batch = next(stream)
        ts, d_metrics = self._jit_d(ts, batch)
        ts, g_metrics = self._jit_g(ts, batch)
        return ts, {**d_metrics, **g_metrics}

    def batches_per_train_call(self) -> int:
        """ONE batch per train call (the fused single sess.run above) —
        overrides ConditionalGanBase's n_disc_train+1 so the device
        pipeline's gather group matches what train() actually consumes."""
        return 1

    def write_summaries(self, writer, step, ts, batch) -> None:
        super().write_summaries(writer, step, ts, batch)
        # shuffle / noise diagnostic paths (improved_sampler.py:204-209),
        # one jitted program over the already-device-resident batch (a
        # host round-trip here would re-upload the full batch per summary
        # write — this environment's PJRT client leaks H2D, CLAUDE.md)
        import numpy as np
        if getattr(self, "_jit_diag", None) is None:
            def diag(ts, batch, step):
                rng = jax.random.fold_in(ts["rng"], step)
                prep = self.prepare(batch, Ctx(training=False, rng=rng))
                perm = jax.random.permutation(rng, prep["g_input"].shape[0])
                x_shuf = prep["g_input"][perm]
                x_noise = jax.random.uniform(rng, prep["g_input"].shape,
                                             minval=-1.0, maxval=1.0)
                ctx = Ctx(training=True, rng=rng)
                g_shuf, _ = self._nets["generator"].apply(
                    ts["params"]["generator"], ts["mstate"]["generator"],
                    x_shuf, ctx)
                g_noise, _ = self._nets["generator"].apply(
                    ts["params"]["generator"], ts["mstate"]["generator"],
                    x_noise, ctx)
                return g_shuf, g_noise
            self._jit_diag = jax.jit(diag)
        g_shuf, g_noise = self._jit_diag(
            ts, {k: jnp.asarray(v) for k, v in batch.items()},
            jnp.asarray(step, jnp.int32))
        from hemx.ops.images import colorize
        n = min(self.args.examples, g_shuf.shape[0])
        g_shuf = np.asarray(jax.device_get((g_shuf + 1) / 2))[:n]
        g_noise = np.asarray(jax.device_get((g_noise + 1) / 2))[:n]
        writer.montage("shuffled/fake_depths", colorize(np.clip(g_shuf, 0, 1)),
                       step)
        writer.montage("noise/fake_depths", colorize(np.clip(g_noise, 0, 1)),
                       step)
        writer.scalar("shuffled/variance", float(g_shuf.var(axis=0).mean()),
                      step)
        writer.scalar("noise/variance", float(g_noise.var(axis=0).mean()), step)
