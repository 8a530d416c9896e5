"""End-to-end model tests on synthetic data over the forced 8-device CPU mesh
(SURVEY.md §4 rebuild implications: smoke-train each model, assert loss falls,
checkpoint round-trips, and DP == single-device grads)."""

import numpy as np
import pytest
import jax

from tests.conftest import make_args

from hemx.data.synthetic import SyntheticDataset
from hemx.models.plugin import available_models, get_model
from hemx.parallel.mesh import make_mesh
from hemx.parallel.dp import shard_batch


def _setup(model_name, n_devices=0, model_parallel=1, spatial_parallel=1,
           **overrides):
    from hemx.parallel.mesh import data_axis_size
    args = make_args(model=model_name, **overrides)
    mesh = make_mesh(n_devices, model=model_parallel,
                     spatial=spatial_parallel)
    splits = SyntheticDataset.get_datasets(args)
    model = get_model(model_name)(args, mesh)
    global_batch = args.batch_size * data_axis_size(mesh)
    host_batch = next(splits["train"].iter_epoch(global_batch, shuffle=False))
    ts = model.init_state(jax.random.PRNGKey(0), host_batch)
    return args, mesh, splits, model, ts, global_batch


def _stream(splits, global_batch, mesh, seed=0):
    def gen():
        e = 0
        while True:
            for b in splits["train"].iter_epoch(global_batch, shuffle=True,
                                                seed=seed, epoch=e):
                yield shard_batch(b, mesh)
            e += 1
    return gen()


class TestRegistry:
    def test_v1_models_registered(self):
        names = available_models()
        for expected in ("cnn", "vae", "gan", "wgan", "iwgan"):
            assert expected in names

    def test_dataset_registry(self):
        from hemx.data.plugin import available_datasets
        names = available_datasets()
        assert "synthetic" in names
        assert "mnist" in names


class TestCnn:
    def test_loss_decreases(self):
        # lr/steps calibrated for TF-parity rmsprop (ones-initialized
        # mean-square accumulator, hemx/train/optimizers.py): early updates
        # are ~lr*g — far smaller than optax's zeros-init sign-SGD-like
        # first steps the old 12x lr=1e-3 smoke was tuned against
        args, mesh, splits, model, ts, gb = _setup("cnn", batch_size=4, lr=1e-2)
        stream = _stream(splits, gb, mesh)
        first = None
        for i in range(20):
            ts, metrics = model.train(ts, stream)
            loss = float(jax.device_get(metrics["loss"]))
            if first is None:
                first = loss
        assert loss < first, f"loss did not fall: {first} -> {loss}"

    def test_eval_and_summaries(self, tmp_path):
        args, mesh, splits, model, ts, gb = _setup("cnn", batch_size=4)
        batch = shard_batch(next(splits["validate"].iter_epoch(gb, shuffle=False)),
                            mesh)
        losses = model.eval_losses(ts, batch)
        assert "loss" in losses
        from hemx.summaries.events import EventsWriter
        w = EventsWriter(str(tmp_path))
        model.write_summaries(w, 0, ts, batch)
        w.close()


class TestVae:
    def test_losses_present_and_finite(self):
        args, mesh, splits, model, ts, gb = _setup("vae", batch_size=4, lr=1e-4)
        stream = _stream(splits, gb, mesh)
        for _ in range(3):
            ts, metrics = model.train(ts, stream)
        for k in ("d_loss", "l_loss", "total_loss"):
            assert np.isfinite(float(jax.device_get(metrics[k]))), k

    def test_sum_reduction_scale(self):
        # sum-reduced Bernoulli recon on a 32x32x3 batch of 32 must be huge
        # (reference parity: examples.org VAE total_loss ~1e5-scale)
        args, mesh, splits, model, ts, gb = _setup("vae", batch_size=4)
        stream = _stream(splits, gb, mesh)
        ts, metrics = model.train(ts, stream)
        assert float(jax.device_get(metrics["d_loss"])) > 100.0


@pytest.mark.parametrize("name", ["gan", "wgan", "iwgan"])
class TestGanFamily:
    def test_train_step_runs(self, name):
        args, mesh, splits, model, ts, gb = _setup(
            name, batch_size=4, lr=1e-4, n_disc_train=2)
        stream = _stream(splits, gb, mesh)
        ts, metrics = model.train(ts, stream)
        g = float(jax.device_get(metrics["g_loss"]))
        d = float(jax.device_get(metrics["d_loss"]))
        assert np.isfinite(g) and np.isfinite(d)

    def test_critic_substeps_use_fresh_rng(self, name):
        """Each optimizer apply must advance the state's base RNG so the
        n_disc_train critic iterations (step counter unchanged) sample fresh
        z / GP alpha — regression for the round-1 advisor high finding (the
        reference re-samples tf.random_* per sess.run, models/gan.py:158-175)."""
        if name == "gan":
            pytest.skip("vanilla gan uses one fused step")
        args, mesh, splits, model, ts, gb = _setup(
            name, batch_size=4, lr=1e-4, n_disc_train=2)
        stream = _stream(splits, gb, mesh)
        rng0 = np.asarray(jax.device_get(ts["rng"]))
        ts, _ = model._jit_d(ts, next(stream))
        rng1 = np.asarray(jax.device_get(ts["rng"]))
        step1 = int(jax.device_get(ts["step"]))
        ts, _ = model._jit_d(ts, next(stream))
        rng2 = np.asarray(jax.device_get(ts["rng"]))
        assert step1 == 0  # critic steps leave the step counter alone...
        assert not np.array_equal(rng0, rng1)  # ...but consume fresh keys
        assert not np.array_equal(rng1, rng2)

    def test_fused_loop_matches_per_substep_dispatch(self, name):
        """--fused_critic_loop (one XLA program per train call) must produce
        exactly the same updated params as per-substep dispatch."""
        if name == "gan":
            pytest.skip("vanilla gan is always one fused step")
        import jax.numpy as jnp
        kw = dict(batch_size=4, lr=1e-3, optimizer="sgd", n_disc_train=2,
                  synthetic_count=128)
        args_f, mesh, splits, model_f, ts_f, gb = _setup(
            name, fused_critic_loop=True, **kw)
        args_u, _, _, model_u, ts_u, _ = _setup(
            name, fused_critic_loop=False, **kw)
        host_batches = list(splits["train"].iter_epoch(gb, shuffle=False))[:3]

        def once(model, ts):
            s = iter([shard_batch(b, mesh) for b in host_batches])
            return model.train(ts, s)

        ts_f, mf = once(model_f, ts_f)
        ts_u, mu = once(model_u, ts_u)
        for k in ("g_loss", "d_loss"):
            np.testing.assert_allclose(float(jax.device_get(mf[k])),
                                       float(jax.device_get(mu[k])),
                                       rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(ts_f["params"]),
                        jax.tree_util.tree_leaves(ts_u["params"])):
            np.testing.assert_allclose(np.asarray(jax.device_get(a)),
                                       np.asarray(jax.device_get(b)),
                                       rtol=1e-5, atol=1e-7)

    def test_iwgan_grad_report_includes_gp(self, name):
        """--summarize_gradients critic histograms must describe the
        gradients actually APPLIED — for IWGAN that is grad of
        (wasserstein_d_loss + 10*gp), not plain d_loss (VERDICT r2 weak #4;
        the reference summarized the real training gradients,
        hem/ops/summaries.py:64-75)."""
        if name != "iwgan":
            pytest.skip("gp is iwgan-only")
        import jax.numpy as jnp
        from hemx.core import Ctx
        from hemx.models import common
        from hemx.ops import losses as L

        args, mesh, splits, model, ts, gb = _setup(
            name, batch_size=2, n_disc_train=1)
        batch = shard_batch(
            next(splits["train"].iter_epoch(gb, shuffle=False)), mesh)
        report = model.grad_report(ts, batch)

        # Recompute grad of the FULL training critic loss with the same
        # key derivation as report_grads (step_rng -> split 3).
        x = 2.0 * (batch["image"] - 0.5)
        rng = common.step_rng(ts)
        rng, zk, ak = jax.random.split(rng, 3)
        z = jax.random.normal(zk, (x.shape[0], args.latent_size))

        def full_loss(dp):
            params = {**ts["params"], "discriminator": dp}
            ctx = lambda: Ctx(training=True, rng=rng)
            g, _ = model._g_forward(params, ts["mstate"], z, ctx())
            d_real, _ = model._d_forward(params, ts["mstate"], x, ctx())
            d_fake, _ = model._d_forward(params, ts["mstate"], g, ctx())
            d_loss = L.wgan_d_loss(d_real, d_fake)
            alpha = jax.random.uniform(ak, (x.shape[0], 1))

            def d_apply(imgs):
                scores, _ = model._d_forward(params, ts["mstate"], imgs,
                                             ctx())
                return scores

            gp = L.gradient_penalty(d_apply, x, g, alpha, per_sample=False)
            return d_loss + 10.0 * gp

        grads = jax.grad(full_loss)(ts["params"]["discriminator"])
        expected = common.summarizable_stats({"discriminator": grads})
        checked = 0
        for tag, stats in expected.items():
            got = float(jax.device_get(report[tag]["mean"]))
            want = float(jax.device_get(stats["mean"]))
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7,
                                       err_msg=tag)
            checked += 1
        assert checked > 0

        # And the full loss differs from plain d_loss — the GP term is live.
        def plain_loss(dp):
            params = {**ts["params"], "discriminator": dp}
            ctx = lambda: Ctx(training=True, rng=rng)
            g, _ = model._g_forward(params, ts["mstate"], z, ctx())
            d_real, _ = model._d_forward(params, ts["mstate"], x, ctx())
            d_fake, _ = model._d_forward(params, ts["mstate"], g, ctx())
            return L.wgan_d_loss(d_real, d_fake)

        plain = jax.grad(plain_loss)(ts["params"]["discriminator"])
        diffs = [np.abs(np.asarray(jax.device_get(a)) -
                        np.asarray(jax.device_get(b))).max()
                 for a, b in zip(jax.tree_util.tree_leaves(grads),
                                 jax.tree_util.tree_leaves(plain))]
        assert max(diffs) > 1e-6, "GP contributed nothing to critic grads"

    def test_wgan_clip(self, name):
        if name != "wgan":
            pytest.skip("clip is wgan-only")
        args, mesh, splits, model, ts, gb = _setup(
            name, batch_size=4, lr=1e-2, n_disc_train=1)
        stream = _stream(splits, gb, mesh)
        ts, _ = model.train(ts, stream)
        for leaf in jax.tree_util.tree_leaves(ts["params"]):
            arr = np.asarray(jax.device_get(leaf))
            assert arr.max() <= 0.01 + 1e-6
            assert arr.min() >= -0.01 - 1e-6


class TestCheckpointRoundtrip:
    def test_save_restore_identical(self, tmp_path):
        from hemx.train.checkpoint import CheckpointManager
        args, mesh, splits, model, ts, gb = _setup("cnn", batch_size=4)
        stream = _stream(splits, gb, mesh)
        ts, _ = model.train(ts, stream)
        mgr = CheckpointManager(str(tmp_path))
        mgr.save({"train_state": ts, "epoch": np.int64(1)}, 1)

        # fresh init, restore, verify params identical
        model2 = get_model("cnn")(args, mesh)
        host_batch = next(splits["train"].iter_epoch(gb, shuffle=False))
        ts2 = model2.init_state(jax.random.PRNGKey(123), host_batch)
        restored = mgr.restore({"train_state": ts2, "epoch": np.int64(0)})
        assert int(restored["epoch"]) == 1
        for a, b in zip(jax.tree_util.tree_leaves(ts["params"]),
                        jax.tree_util.tree_leaves(restored["train_state"]["params"])):
            np.testing.assert_array_equal(np.asarray(jax.device_get(a)),
                                          np.asarray(jax.device_get(b)))

    def test_max_to_keep(self, tmp_path):
        from hemx.train.checkpoint import CheckpointManager
        mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
        for e in range(5):
            mgr.save({"x": np.zeros(3)}, e)
        assert [e for e, _ in mgr.checkpoints()] == [3, 4]


class TestDataParallel:
    def test_dp_grads_match_single_device(self):
        """pmean-equivalent: an 8-device sharded step must produce the same
        updated params as a 1-device run on the same global batch
        (SURVEY.md §4 implication 3)."""
        args8, mesh8, splits, model8, ts8, gb = _setup("cnn", n_devices=0,
                                                       batch_size=2)
        args1, mesh1, _, model1, ts1, _ = _setup("cnn", n_devices=1,
                                                 batch_size=2 * mesh8.size)
        host_batch = next(splits["train"].iter_epoch(
            2 * mesh8.size, shuffle=False))

        def once(model, ts, mesh):
            s = iter([shard_batch(host_batch, mesh)])
            new_ts, metrics = model.train(ts, s)
            return new_ts, metrics

        ts8n, m8 = once(model8, ts8, mesh8)
        ts1n, m1 = once(model1, ts1, mesh1)
        np.testing.assert_allclose(float(jax.device_get(m8["loss"])),
                                   float(jax.device_get(m1["loss"])), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(ts8n["params"]),
                        jax.tree_util.tree_leaves(ts1n["params"])):
            np.testing.assert_allclose(np.asarray(jax.device_get(a)),
                                       np.asarray(jax.device_get(b)),
                                       rtol=2e-4, atol=1e-6)

    def test_dp_iwgan_matches_single_device(self):
        """Full IWGAN train() call (critic loop with gradient-penalty
        double-backprop + generator update): 8-device sharded must equal a
        1-device run on the same batch sequence (VERDICT r1 weak #2)."""
        # sgd so param deltas are exactly lr*grad: adam's early-step
        # m/sqrt(v) normalization turns reduction-order noise on near-zero
        # gradient elements into full +-lr sign flips, which would force a
        # uselessly loose tolerance. Sharding correctness of the GP
        # double-backprop gradients is what this test pins down.
        args8, mesh8, splits, model8, ts8, _ = _setup(
            "iwgan", n_devices=0, batch_size=2, lr=1e-3, n_disc_train=2,
            optimizer="sgd")
        args1, mesh1, _, model1, ts1, _ = _setup(
            "iwgan", n_devices=1, batch_size=2 * mesh8.size, lr=1e-3,
            n_disc_train=2, optimizer="sgd")
        gb = 2 * mesh8.size
        host_batches = list(splits["train"].iter_epoch(gb, shuffle=False))[:3]

        def once(model, ts, mesh):
            s = iter([shard_batch(b, mesh) for b in host_batches])
            return model.train(ts, s)

        ts8n, m8 = once(model8, ts8, mesh8)
        ts1n, m1 = once(model1, ts1, mesh1)
        for k in ("g_loss", "d_loss"):
            np.testing.assert_allclose(float(jax.device_get(m8[k])),
                                       float(jax.device_get(m1[k])),
                                       rtol=5e-4, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(ts8n["params"]),
                        jax.tree_util.tree_leaves(ts1n["params"])):
            np.testing.assert_allclose(np.asarray(jax.device_get(a)),
                                       np.asarray(jax.device_get(b)),
                                       rtol=2e-3, atol=2e-5)

    def test_dp_vae_matches_single_device(self):
        """VAE (reparameterized z draw inside the jitted step, sum-reduced
        losses): 8-device sharded == 1-device on the same global batch —
        the per-position-deterministic threefry draw must be sharding-
        invariant for this to hold. sgd so param deltas are exactly lr*grad
        (rmsprop's step-1 g/|g| normalization turns reduction-order sign
        noise on near-zero gradients into full 2*lr*sqrt(10) flips)."""
        args8, mesh8, splits, model8, ts8, _ = _setup("vae", n_devices=0,
                                                      batch_size=2,
                                                      optimizer="sgd",
                                                      lr=1e-3)
        args1, mesh1, _, model1, ts1, _ = _setup("vae", n_devices=1,
                                                 batch_size=2 * mesh8.size,
                                                 optimizer="sgd", lr=1e-3)
        host_batch = next(splits["train"].iter_epoch(
            2 * mesh8.size, shuffle=False))

        def once(model, ts, mesh):
            s = iter([shard_batch(host_batch, mesh)])
            return model.train(ts, s)

        # ts is donated to the jitted step — materialize the old params
        # first (CLAUDE.md: donated train states).
        old8 = [np.asarray(x) for x in
                jax.tree_util.tree_leaves(jax.device_get(ts8["params"]))]
        old1 = [np.asarray(x) for x in
                jax.tree_util.tree_leaves(jax.device_get(ts1["params"]))]
        ts8n, m8 = once(model8, ts8, mesh8)
        ts1n, m1 = once(model1, ts1, mesh1)
        np.testing.assert_allclose(float(jax.device_get(m8["total_loss"])),
                                   float(jax.device_get(m1["total_loss"])),
                                   rtol=1e-5)
        # Compare the sgd UPDATES (-lr*grad). The sum-reduced VAE loss makes
        # gradients ~1e3-scale, so reduction-order noise is visible at
        # rtol~1e-3; and conv biases that feed straight into BN have
        # exactly-zero true gradient (the BN mean subtraction cancels the
        # bias), so those leaves are pure float noise — covered by an atol
        # proportional to the largest update anywhere in the tree.
        d8 = [np.asarray(jax.device_get(a)) - o for a, o in
              zip(jax.tree_util.tree_leaves(ts8n["params"]), old8)]
        d1 = [np.asarray(jax.device_get(a)) - o for a, o in
              zip(jax.tree_util.tree_leaves(ts1n["params"]), old1)]
        global_scale = max(np.abs(x).max() for x in d1)
        for a, b in zip(d8, d1):
            np.testing.assert_allclose(a, b, rtol=2e-3,
                                       atol=2e-3 * global_scale)

    def test_dp_wgan_clip_matches_single_device(self):
        """WGAN's clip-after-apply (the one optimizer side-effect outside
        apply_updates_group) must be sharding-invariant: 8-device DP equals
        single device for one full train() call incl. the +-0.01 clamp on
        both nets (VERDICT r2 next #8)."""
        args8, mesh8, splits, model8, ts8, _ = _setup(
            "wgan", n_devices=0, batch_size=2, lr=1e-3, n_disc_train=2,
            optimizer="sgd")
        args1, mesh1, _, model1, ts1, _ = _setup(
            "wgan", n_devices=1, batch_size=2 * mesh8.size, lr=1e-3,
            n_disc_train=2, optimizer="sgd")
        gb = 2 * mesh8.size
        host_batches = list(splits["train"].iter_epoch(gb, shuffle=False))[:3]

        def once(model, ts, mesh):
            s = iter([shard_batch(b, mesh) for b in host_batches])
            return model.train(ts, s)

        ts8n, m8 = once(model8, ts8, mesh8)
        ts1n, m1 = once(model1, ts1, mesh1)
        for k in ("g_loss", "d_loss"):
            np.testing.assert_allclose(float(jax.device_get(m8[k])),
                                       float(jax.device_get(m1[k])),
                                       rtol=5e-4, atol=1e-5)
        clipped = 0
        for a, b in zip(jax.tree_util.tree_leaves(ts8n["params"]),
                        jax.tree_util.tree_leaves(ts1n["params"])):
            av = np.asarray(jax.device_get(a))
            bv = np.asarray(jax.device_get(b))
            np.testing.assert_allclose(av, bv, rtol=2e-3, atol=2e-5)
            assert av.max() <= 0.01 + 1e-6 and av.min() >= -0.01 - 1e-6
            clipped += int((np.abs(av) >= 0.01 - 1e-7).any())
        assert clipped > 0, "clamp never engaged; test lost its teeth"

    def test_dp_paper_sampler_matches_single_device(self):
        """paper_sampler (two-optimizer conditional GAN, in-step uniform
        noise draw at site x, mean-adjusted output): 8-device DP equals
        single device (VERDICT r2 next #8). Optimizers swapped to sgd before
        init_state so param deltas are exactly lr*grad (see the iwgan test's
        adam note)."""
        import optax

        def setup(n_devices, batch_size):
            kw = dict(batch_size=batch_size, noise_layer="x", e_bn=False,
                      synthetic_shape=[65, 65, 3], g_lr=1e-4, d_lr=1e-4,
                      g_beta1=0.5, d_beta1=0.9, g_beta2=0.999, d_beta2=0.999)
            args = make_args(model="paper_sampler", **kw)
            mesh = make_mesh(n_devices)
            splits = SyntheticDataset.get_datasets(args)
            model = get_model("paper_sampler")(args, mesh)
            model.g_optimizer = optax.sgd(1e-3)
            model.d_optimizer = optax.sgd(1e-3)
            gb = args.batch_size * mesh.size
            host = next(splits["train"].iter_epoch(gb, shuffle=False))
            ts = model.init_state(jax.random.PRNGKey(0), host)
            return splits, model, ts, mesh

        splits, model8, ts8, mesh8 = setup(0, 2)
        _, model1, ts1, mesh1 = setup(1, 2 * mesh8.size)
        gb = 2 * mesh8.size
        host_batches = list(splits["train"].iter_epoch(gb, shuffle=False))[:2]

        def once(model, ts, mesh):
            s = iter([shard_batch(b, mesh) for b in host_batches])
            return model.train(ts, s)

        ts8n, m8 = once(model8, ts8, mesh8)
        ts1n, m1 = once(model1, ts1, mesh1)
        for k in ("g_loss", "d_loss", "rmse"):
            np.testing.assert_allclose(float(jax.device_get(m8[k])),
                                       float(jax.device_get(m1[k])),
                                       rtol=5e-4, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(ts8n["params"]),
                        jax.tree_util.tree_leaves(ts1n["params"])):
            np.testing.assert_allclose(np.asarray(jax.device_get(a)),
                                       np.asarray(jax.device_get(b)),
                                       rtol=2e-3, atol=2e-5)

    def test_dp_artist_matches_single_device(self):
        """artist: two optimizers training DISJOINT variable sets from two
        different batches (x step must not touch the encoder) — the one
        multi-optimizer partition pattern not covered by the GAN tests.
        8-device DP equals single device under sgd."""
        args8, mesh8, splits, model8, ts8, gb = _setup(
            "artist", batch_size=2, optimizer="sgd", lr=1e-3,
            synthetic_shape=[65, 65, 3])
        args1, mesh1, _, model1, ts1, _ = _setup(
            "artist", n_devices=1, batch_size=gb, optimizer="sgd",
            lr=1e-3, synthetic_shape=[65, 65, 3])
        host_batches = list(splits["train"].iter_epoch(gb, shuffle=False))[:2]

        def once(model, ts, mesh):
            s = iter([shard_batch(b, mesh) for b in host_batches])
            return model.train(ts, s)

        ts8n, m8 = once(model8, ts8, mesh8)
        ts1n, m1 = once(model1, ts1, mesh1)
        for k in ("x_loss", "y_loss"):
            np.testing.assert_allclose(float(jax.device_get(m8[k])),
                                       float(jax.device_get(m1[k])),
                                       rtol=5e-4, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(ts8n["params"]),
                        jax.tree_util.tree_leaves(ts1n["params"])):
            np.testing.assert_allclose(np.asarray(jax.device_get(a)),
                                       np.asarray(jax.device_get(b)),
                                       rtol=2e-3, atol=2e-5)

    def test_dp_info_gan_matches_single_device(self):
        """info_gan: three optimizers (D, G, and Q's mutual-information
        step updating predictor+generator jointly) over three batches;
        8-device DP equals single device under sgd."""
        args8, mesh8, splits, model8, ts8, gb = _setup(
            "info_gan", batch_size=2, optimizer="sgd", lr=1e-3)
        args1, mesh1, _, model1, ts1, _ = _setup(
            "info_gan", n_devices=1, batch_size=gb, optimizer="sgd",
            lr=1e-3)
        host_batches = list(splits["train"].iter_epoch(gb, shuffle=False))[:3]

        def once(model, ts, mesh):
            s = iter([shard_batch(b, mesh) for b in host_batches])
            return model.train(ts, s)

        ts8n, m8 = once(model8, ts8, mesh8)
        ts1n, m1 = once(model1, ts1, mesh1)
        for k in ("g_loss", "d_loss", "q_loss"):
            np.testing.assert_allclose(float(jax.device_get(m8[k])),
                                       float(jax.device_get(m1[k])),
                                       rtol=5e-4, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(ts8n["params"]),
                        jax.tree_util.tree_leaves(ts1n["params"])):
            np.testing.assert_allclose(np.asarray(jax.device_get(a)),
                                       np.asarray(jax.device_get(b)),
                                       rtol=2e-3, atol=2e-5)

    def test_dp_conditional_matches_single_device(self):
        """ConditionalGanBase (pix2pix, deterministic config): 8-device DP
        equals single device for one full D+G train() call."""
        from hemx.data.synthetic import SyntheticDataset
        kw = dict(batch_size=2, lr=1e-3, n_disc_train=1, add_l1=True,
                  l1_lambda=10.0, noise=[], dropout=0,
                  batch_norm_disc=False, batch_norm_gen=False,
                  synthetic_shape=[32, 32, 3], optimizer="sgd")
        args8, mesh8, splits, model8, ts8, _ = _setup("pix2pix", n_devices=0,
                                                      **kw)
        kw1 = dict(kw, batch_size=2 * mesh8.size)
        args1, mesh1, _, model1, ts1, _ = _setup("pix2pix", n_devices=1, **kw1)
        gb = 2 * mesh8.size
        host_batches = list(splits["train"].iter_epoch(gb, shuffle=False))[:2]

        def once(model, ts, mesh):
            s = iter([shard_batch(b, mesh) for b in host_batches])
            return model.train(ts, s)

        ts8n, m8 = once(model8, ts8, mesh8)
        ts1n, m1 = once(model1, ts1, mesh1)
        for k in ("g_loss", "d_loss"):
            np.testing.assert_allclose(float(jax.device_get(m8[k])),
                                       float(jax.device_get(m1[k])),
                                       rtol=5e-4, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(ts8n["params"]),
                        jax.tree_util.tree_leaves(ts1n["params"])):
            np.testing.assert_allclose(np.asarray(jax.device_get(a)),
                                       np.asarray(jax.device_get(b)),
                                       rtol=2e-3, atol=2e-5)


class TestModelParallel:
    """--model_parallel: conv/dense kernel output channels sharded over a
    second 'model' mesh axis (hemx.parallel.mesh.param_spec). Shardings
    never change math — a (data=4, model=2) run must equal a single-device
    run on the same global batch, with GSPMD supplying the collectives."""

    def test_param_placement_rule(self):
        """init_state on a TP mesh must land kernels (ndim>=2, divisible
        last dim) sharded over 'model' and everything else replicated —
        for params AND their optimizer moments."""
        from hemx.parallel.mesh import MODEL_AXIS
        args, mesh, splits, model, ts, gb = _setup(
            "cnn", n_devices=0, model_parallel=2, batch_size=2)
        assert dict(mesh.shape) == {"data": 4, "model": 2}

        def specs(tree):
            return [(path, leaf.sharding.spec, leaf.shape) for path, leaf in
                    jax.tree_util.tree_flatten_with_path(tree)[0]]

        sharded = 0
        for section in ("params", "opt"):
            for path, spec, shape in specs(ts[section]):
                if len(shape) >= 2 and shape[-1] % 2 == 0:
                    assert spec[-1] == MODEL_AXIS, (section, path, spec)
                    sharded += 1
                else:
                    assert all(s is None for s in spec), (section, path, spec)
        assert sharded >= 4  # conv kernels + their moments actually sharded

    def test_tp_cnn_matches_single_device(self):
        args8, mesh8, splits, model8, ts8, gb = _setup(
            "cnn", n_devices=0, model_parallel=2, batch_size=2)
        args1, mesh1, _, model1, ts1, _ = _setup("cnn", n_devices=1,
                                                 batch_size=gb)
        host_batch = next(splits["train"].iter_epoch(gb, shuffle=False))

        def once(model, ts, mesh):
            s = iter([shard_batch(host_batch, mesh)])
            return model.train(ts, s)

        ts8n, m8 = once(model8, ts8, mesh8)
        ts1n, m1 = once(model1, ts1, mesh1)
        np.testing.assert_allclose(float(jax.device_get(m8["loss"])),
                                   float(jax.device_get(m1["loss"])),
                                   rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(ts8n["params"]),
                        jax.tree_util.tree_leaves(ts1n["params"])):
            np.testing.assert_allclose(np.asarray(jax.device_get(a)),
                                       np.asarray(jax.device_get(b)),
                                       rtol=2e-4, atol=1e-6)

    def test_tp_iwgan_matches_single_device(self):
        """IWGAN under dp x tp: the fused critic loop with GP
        double-backprop must tolerate channel-sharded critic kernels
        (sgd for the same reason as the DP variant)."""
        args8, mesh8, splits, model8, ts8, gb = _setup(
            "iwgan", n_devices=0, model_parallel=2, batch_size=2, lr=1e-3,
            n_disc_train=2, optimizer="sgd")
        args1, mesh1, _, model1, ts1, _ = _setup(
            "iwgan", n_devices=1, batch_size=gb, lr=1e-3,
            n_disc_train=2, optimizer="sgd")
        host_batches = list(splits["train"].iter_epoch(gb, shuffle=False))[:3]

        def once(model, ts, mesh):
            s = iter([shard_batch(b, mesh) for b in host_batches])
            return model.train(ts, s)

        ts8n, m8 = once(model8, ts8, mesh8)
        ts1n, m1 = once(model1, ts1, mesh1)
        for k in ("g_loss", "d_loss"):
            np.testing.assert_allclose(float(jax.device_get(m8[k])),
                                       float(jax.device_get(m1[k])),
                                       rtol=5e-4, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(ts8n["params"]),
                        jax.tree_util.tree_leaves(ts1n["params"])):
            np.testing.assert_allclose(np.asarray(jax.device_get(a)),
                                       np.asarray(jax.device_get(b)),
                                       rtol=2e-3, atol=2e-5)

    def test_tp_train_loop_end_to_end(self, tmp_path):
        """Full loop.train on a (4, 2) mesh: global batch scales with the
        data axis only, the device-resident cache feeds a TP mesh, and the
        result equals the same config trained data-parallel-only."""
        import hemx
        from hemx.data.synthetic import SyntheticDataset

        results = {}
        for mp in (1, 2):
            args = make_args(model="cnn", batch_size=4, epochs="2",
                             dir=str(tmp_path / f"tp_{mp}"), seed=5,
                             synthetic_count=64, synthetic_eval_count=16,
                             synthetic_shape=[32, 32, 3], lr=1e-3,
                             model_parallel=mp, optimizer="sgd")
            mesh = make_mesh(0, model=mp)
            splits = SyntheticDataset.get_datasets(args)
            model = get_model("cnn")(args, mesh)
            results[mp] = hemx.train(model, splits, args, mesh)
        # mp=1 global batch = 4*8, mp=2 = 4*4: different consumption order,
        # so just require both trained to finite params and wrote epochs.
        for mp, res in results.items():
            assert res["epoch"] == 2
            for leaf in jax.tree_util.tree_leaves(
                    res["train_state"]["params"]):
                assert np.isfinite(np.asarray(jax.device_get(leaf))).all()

    def test_tp_pix2pix_matches_single_device(self):
        """Conditional family (two optimizers, G consumes the image) on a
        (data=4, model=2) mesh equals single device — the per-leaf
        param/moment shardings of a two-optimizer state and the channel-
        sharded U-net backward are exact under tp (unlike sp, where this
        family must reshard to DP at step entry — _pin_dp). Same sgd
        update-delta rationale as the DP iwgan test."""
        kw = dict(n_disc_train=1, add_l1=True, l1_lambda=10.0, noise=[],
                  dropout=0, batch_norm_disc=False, batch_norm_gen=False,
                  lr=1e-3, optimizer="sgd")
        args8, mesh8, splits, model8, ts8, gb = _setup(
            "pix2pix", n_devices=0, model_parallel=2, batch_size=2, **kw)
        assert dict(mesh8.shape) == {"data": 4, "model": 2}
        args1, mesh1, _, model1, ts1, _ = _setup(
            "pix2pix", n_devices=1, batch_size=gb, **kw)
        host_batches = list(splits["train"].iter_epoch(gb, shuffle=False))[:2]

        def once(model, ts, mesh):
            s = iter([shard_batch(b, mesh) for b in host_batches])
            return model.train(ts, s)

        ts8n, m8 = once(model8, ts8, mesh8)
        ts1n, m1 = once(model1, ts1, mesh1)
        for k in ("g_loss", "d_loss", "g_grad_norm", "d_grad_norm"):
            np.testing.assert_allclose(float(jax.device_get(m8[k])),
                                       float(jax.device_get(m1[k])),
                                       rtol=5e-4, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(ts8n["params"]),
                        jax.tree_util.tree_leaves(ts1n["params"])):
            np.testing.assert_allclose(np.asarray(jax.device_get(a)),
                                       np.asarray(jax.device_get(b)),
                                       rtol=2e-3, atol=2e-5)


class TestSpatialParallel:
    """--spatial_parallel: image-height sharding over a 'spatial' mesh axis
    (hemx.parallel.mesh.batch_spec); GSPMD supplies the conv halo
    exchanges. Shardings never change math — spatially-partitioned runs
    must equal single-device runs on the same global batch. TPU-native
    replacement for the reference's patch-based spatial decomposition
    (paper_fullimage.py:302-316)."""

    def test_batch_placement_rule(self):
        """shard_batch on a spatial mesh lands rank-4 image leaves sharded
        (data, spatial) and low-rank leaves (labels, latents) data-only."""
        from hemx.parallel.mesh import DATA_AXIS, SPATIAL_AXIS
        mesh = make_mesh(0, spatial=2)
        assert dict(mesh.shape) == {"data": 4, "spatial": 2}
        host = {"image": np.zeros((8, 32, 32, 3), np.float32),
                "label": np.zeros((8,), np.int32),
                "odd_h": np.zeros((8, 31, 31, 3), np.float32)}
        dev = shard_batch(host, mesh)
        assert dev["image"].sharding.spec == (DATA_AXIS, SPATIAL_AXIS)
        assert tuple(dev["label"].sharding.spec) == (DATA_AXIS,)
        # height not divisible by the spatial degree -> data-only fallback
        assert tuple(dev["odd_h"].sharding.spec) == (DATA_AXIS,)

    def test_sp_tp_combination_rejected(self):
        """spatial x model on one mesh is rejected loudly: XLA's SPMD
        partitioner mis-accumulates conv weight grads when channel- and
        height-sharding compose in one backward pass (make_mesh
        docstring). Silently-wrong training is the one unacceptable
        failure mode."""
        with pytest.raises(ValueError, match="cannot be combined"):
            make_mesh(0, spatial=2, model=2)

    def test_sp_cnn_matches_single_device(self):
        """sgd: spatial sharding moves conv reductions across shard
        boundaries (f32 reduction-order noise ~1e-7), and rmsprop's first
        step is ~sign(g)*lr/sqrt(1-decay) — it amplifies that noise to
        visible update flips on near-zero gradients (same reason the DP
        iwgan equality test runs sgd)."""
        args8, mesh8, splits, model8, ts8, gb = _setup(
            "cnn", n_devices=0, spatial_parallel=2, batch_size=2,
            optimizer="sgd", lr=1e-3)
        args1, mesh1, _, model1, ts1, _ = _setup("cnn", n_devices=1,
                                                 batch_size=gb,
                                                 optimizer="sgd", lr=1e-3)
        host_batch = next(splits["train"].iter_epoch(gb, shuffle=False))

        def once(model, ts, mesh):
            s = iter([shard_batch(host_batch, mesh)])
            return model.train(ts, s)

        ts8n, m8 = once(model8, ts8, mesh8)
        ts1n, m1 = once(model1, ts1, mesh1)
        np.testing.assert_allclose(float(jax.device_get(m8["loss"])),
                                   float(jax.device_get(m1["loss"])),
                                   rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(ts8n["params"]),
                        jax.tree_util.tree_leaves(ts1n["params"])):
            np.testing.assert_allclose(np.asarray(jax.device_get(a)),
                                       np.asarray(jax.device_get(b)),
                                       rtol=2e-4, atol=1e-6)

    def test_sp_dp_iwgan_matches_single_device(self):
        """The sp x dp mesh (data=4, spatial=2): IWGAN's critic substeps
        with GP double-backprop under simultaneous batch- and height-
        sharding must equal the single-device run. Exercises the spatial-
        mesh three-program split (_compile's sp notes: Wasserstein grads
        spatially sharded, GP grads pinned data-parallel, explicit
        combine) — the fused one-program forms mis-partition under sp
        (sgd for the same reason as the DP variant)."""
        args8, mesh8, splits, model8, ts8, gb = _setup(
            "iwgan", n_devices=0, spatial_parallel=2,
            batch_size=2, lr=1e-3, n_disc_train=2, optimizer="sgd")
        assert dict(mesh8.shape) == {"data": 4, "spatial": 2}
        args1, mesh1, _, model1, ts1, _ = _setup(
            "iwgan", n_devices=1, batch_size=gb, lr=1e-3,
            n_disc_train=2, optimizer="sgd")
        host_batches = list(splits["train"].iter_epoch(gb, shuffle=False))[:3]

        def once(model, ts, mesh):
            s = iter([shard_batch(b, mesh) for b in host_batches])
            return model.train(ts, s)

        ts8n, m8 = once(model8, ts8, mesh8)
        ts1n, m1 = once(model1, ts1, mesh1)
        for k in ("g_loss", "d_loss"):
            np.testing.assert_allclose(float(jax.device_get(m8[k])),
                                       float(jax.device_get(m1[k])),
                                       rtol=5e-4, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(ts8n["params"]),
                        jax.tree_util.tree_leaves(ts1n["params"])):
            np.testing.assert_allclose(np.asarray(jax.device_get(a)),
                                       np.asarray(jax.device_get(b)),
                                       rtol=2e-3, atol=2e-5)

    def test_sp_gan_matches_single_device(self):
        """Vanilla GAN under sp: fused_gan_step is ONE program with both
        the D-grad and the G-through-D-grad — the composition class the
        sp workarounds exist for. This asserts the fused dispatch is
        exact under a spatial mesh (if it ever mis-partitions like the
        IWGAN GP program, the fix is a per-substep dispatch under sp)."""
        args8, mesh8, splits, model8, ts8, gb = _setup(
            "gan", n_devices=0, spatial_parallel=2, batch_size=2,
            optimizer="sgd", lr=1e-3)
        args1, mesh1, _, model1, ts1, _ = _setup(
            "gan", n_devices=1, batch_size=gb, optimizer="sgd", lr=1e-3)
        host_batch = next(splits["train"].iter_epoch(gb, shuffle=False))

        def once(model, ts, mesh):
            s = iter([shard_batch(host_batch, mesh)])
            return model.train(ts, s)

        ts8n, m8 = once(model8, ts8, mesh8)
        ts1n, m1 = once(model1, ts1, mesh1)
        for k in ("g_loss", "d_loss"):
            np.testing.assert_allclose(float(jax.device_get(m8[k])),
                                       float(jax.device_get(m1[k])),
                                       rtol=5e-4, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(ts8n["params"]),
                        jax.tree_util.tree_leaves(ts1n["params"])):
            np.testing.assert_allclose(np.asarray(jax.device_get(a)),
                                       np.asarray(jax.device_get(b)),
                                       rtol=2e-3, atol=2e-5)

    def test_sp_vae_matches_single_device(self):
        """VAE under spatial sharding needs NO pins: its sp=2 drift equals
        the plain dp=8 drift to 3 digits (reduction-order noise on the
        sum-reduced loss — see VaeModel._forward). Same update-delta metric
        as the DP vae test (BN-fed conv biases have exactly-zero true
        gradient, so those leaves are pure float noise)."""
        args8, mesh8, splits, model8, ts8, gb = _setup(
            "vae", n_devices=0, spatial_parallel=2, batch_size=2,
            optimizer="sgd", lr=1e-3)
        args1, mesh1, _, model1, ts1, _ = _setup(
            "vae", n_devices=1, batch_size=gb, optimizer="sgd", lr=1e-3)
        host_batch = next(splits["train"].iter_epoch(gb, shuffle=False))

        old8 = [np.asarray(x) for x in
                jax.tree_util.tree_leaves(jax.device_get(ts8["params"]))]
        old1 = [np.asarray(x) for x in
                jax.tree_util.tree_leaves(jax.device_get(ts1["params"]))]
        ts8n, m8 = model8.train(ts8, iter([shard_batch(host_batch, mesh8)]))
        ts1n, m1 = model1.train(ts1, iter([shard_batch(host_batch, mesh1)]))
        np.testing.assert_allclose(float(jax.device_get(m8["total_loss"])),
                                   float(jax.device_get(m1["total_loss"])),
                                   rtol=1e-5)
        d8 = [np.asarray(jax.device_get(a)) - o for a, o in
              zip(jax.tree_util.tree_leaves(ts8n["params"]), old8)]
        d1 = [np.asarray(jax.device_get(a)) - o for a, o in
              zip(jax.tree_util.tree_leaves(ts1n["params"]), old1)]
        global_scale = max(np.abs(x).max() for x in d1)
        for a, b in zip(d8, d1):
            np.testing.assert_allclose(a, b, rtol=2e-3,
                                       atol=8e-3 * global_scale)

    def test_sp_train_loop_end_to_end(self, tmp_path):
        """Full loop.train on a (data=4, spatial=2) mesh: the device-
        resident dataset cache must land gathered batches in the
        (data, spatial) layout (DeviceDataPipeline out_shardings =
        mesh.batch_shardings), and training/eval/checkpointing must run
        to completion with finite params."""
        import hemx
        from hemx.data.synthetic import SyntheticDataset

        args = make_args(model="cnn", batch_size=4, epochs="2",
                         dir=str(tmp_path / "sp_ws"), seed=5,
                         synthetic_count=64, synthetic_eval_count=16,
                         synthetic_shape=[32, 32, 3], lr=1e-3,
                         spatial_parallel=2, optimizer="sgd")
        mesh = make_mesh(0, spatial=2)
        splits = SyntheticDataset.get_datasets(args)
        model = get_model("cnn")(args, mesh)
        res = hemx.train(model, splits, args, mesh)
        assert res["epoch"] == 2
        for leaf in jax.tree_util.tree_leaves(res["train_state"]["params"]):
            assert np.isfinite(np.asarray(jax.device_get(leaf))).all()

    def test_sp_paper_standalone_matches_single_device(self):
        """paper_standalone is the one image-consuming model NOT routed
        through ConditionalGanBase (no discriminator, single supervised
        grad program) — if its encoder backward mis-partitions under
        spatial sharding like the conditional family's did, this catches
        it."""
        import optax

        def setup(n_devices, spatial, batch_size):
            kw = dict(batch_size=batch_size, synthetic_shape=[65, 65, 3],
                      g_lr=1e-4, g_beta1=0.5, g_beta2=0.999,
                      model_version="mean_adjusted")
            args = make_args(model="paper_standalone", **kw)
            mesh = make_mesh(n_devices, spatial=spatial)
            splits = SyntheticDataset.get_datasets(args)
            model = get_model("paper_standalone")(args, mesh)
            model.optimizer = optax.sgd(1e-3)
            gb = args.batch_size * (mesh.devices.size // spatial)
            host = next(splits["train"].iter_epoch(gb, shuffle=False))
            ts = model.init_state(jax.random.PRNGKey(0), host)
            return splits, model, ts, mesh, gb

        splits, model8, ts8, mesh8, gb = setup(0, 2, 2)
        _, model1, ts1, mesh1, _ = setup(1, 1, gb)
        host_batch = next(splits["train"].iter_epoch(gb, shuffle=False))

        def once(model, ts, mesh):
            s = iter([shard_batch(host_batch, mesh)])
            return model.train(ts, s)

        ts8n, m8 = once(model8, ts8, mesh8)
        ts1n, m1 = once(model1, ts1, mesh1)
        np.testing.assert_allclose(float(jax.device_get(m8["rmse"])),
                                   float(jax.device_get(m1["rmse"])),
                                   rtol=5e-4, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(ts8n["params"]),
                        jax.tree_util.tree_leaves(ts1n["params"])):
            np.testing.assert_allclose(np.asarray(jax.device_get(a)),
                                       np.asarray(jax.device_get(b)),
                                       rtol=2e-3, atol=2e-5)

    def test_sp_pix2pix_matches_single_device(self):
        """Conditional family on a spatial mesh: G consumes the IMAGE, so
        spatial sharding would flow through its encoder-deconv backward,
        where the partitioner emits wrong generator grads (g_grad_norm
        19.3 vs 4.46 with every loss matching) — the steps reshard the
        batch to the data-parallel layout at entry instead
        (ConditionalGanBase._pin_dp). This asserts that path is exact."""
        kw = dict(n_disc_train=1, add_l1=True, l1_lambda=10.0, noise=[],
                  dropout=0, batch_norm_disc=False, batch_norm_gen=False,
                  lr=1e-3, optimizer="sgd")
        args8, mesh8, splits, model8, ts8, gb = _setup(
            "pix2pix", n_devices=0, spatial_parallel=2, batch_size=2, **kw)
        args1, mesh1, _, model1, ts1, _ = _setup(
            "pix2pix", n_devices=1, batch_size=gb, **kw)
        host_batches = list(splits["train"].iter_epoch(gb, shuffle=False))[:2]

        def once(model, ts, mesh):
            s = iter([shard_batch(b, mesh) for b in host_batches])
            return model.train(ts, s)

        ts8n, m8 = once(model8, ts8, mesh8)
        ts1n, m1 = once(model1, ts1, mesh1)
        for k in ("g_loss", "d_loss", "g_grad_norm", "d_grad_norm"):
            np.testing.assert_allclose(float(jax.device_get(m8[k])),
                                       float(jax.device_get(m1[k])),
                                       rtol=5e-4, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(ts8n["params"]),
                        jax.tree_util.tree_leaves(ts1n["params"])):
            np.testing.assert_allclose(np.asarray(jax.device_get(a)),
                                       np.asarray(jax.device_get(b)),
                                       rtol=2e-3, atol=2e-5)


class TestCheckNumerics:
    def test_nan_grads_reported(self):
        from hemx.models import common
        args, mesh, splits, model, ts, gb = _setup(
            "cnn", batch_size=4, check_numerics=True)
        stream = _stream(splits, gb, mesh)
        ts, metrics = model.train(ts, stream)
        host = common.host_scalars(metrics)
        common.raise_on_bad_grads(host)  # no NaN: should not raise
        # poison a flag and verify the named error fires
        host["grad_finite"]["encoder/c1/w"] = False
        with pytest.raises(FloatingPointError, match="encoder/c1/w"):
            common.raise_on_bad_grads(host)

    @pytest.mark.parametrize("fused", [True, False])
    def test_wgan_critic_flags_survive_merge(self, fused):
        """The train-call metrics must carry BOTH critic and generator
        finite-ness flags: a plain {**d_metrics, **g_metrics} merge let
        g_step's grad_finite overwrite the critic's, so --check_numerics
        missed critic NaNs — the most common WGAN failure."""
        from hemx.models import common
        args, mesh, splits, model, ts, gb = _setup(
            "iwgan", batch_size=4, check_numerics=True,
            fused_critic_loop=fused)
        stream = _stream(splits, gb, mesh)
        ts, metrics = model.train(ts, stream)
        host = common.host_scalars(metrics)
        flags = host["grad_finite"]
        assert any(k.startswith("d/") for k in flags), sorted(flags)
        assert any(k.startswith("g/") for k in flags), sorted(flags)
        common.raise_on_bad_grads(host)  # finite run: no raise


class TestHostSlice:
    def test_global_batch_partitioned_across_processes(self):
        """Multi-host feeding: each process keeps a distinct contiguous
        shard of the same seeded global order (hemx.parallel.dp.host_slice)."""
        from hemx.parallel.dp import host_slice
        batch = {"image": np.arange(16 * 2).reshape(16, 2)}
        shards = [host_slice(batch, process_index=i, process_count=4)["image"]
                  for i in range(4)]
        assert all(s.shape == (4, 2) for s in shards)
        np.testing.assert_array_equal(np.concatenate(shards), batch["image"])
        # single-process passthrough
        same = host_slice(batch, process_index=0, process_count=1)
        np.testing.assert_array_equal(same["image"], batch["image"])
