"""Conditional model zoo tests (pix2pix, mean_depth_estimator) on synthetic
image+depth pairs over the 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from tests.conftest import make_args
from hemx.data.synthetic import SyntheticDataset
from hemx.models.plugin import get_model
from hemx.parallel.dp import shard_batch
from hemx.parallel.mesh import make_mesh


def _setup(name, **overrides):
    overrides.setdefault("synthetic_shape", [32, 32, 3])
    overrides.setdefault("batch_size", 2)
    args = make_args(model=name, **overrides)
    mesh = make_mesh(0)
    splits = SyntheticDataset.get_datasets(args)
    model = get_model(name)(args, mesh)
    gb = args.batch_size * mesh.size
    host = next(splits["train"].iter_epoch(gb, shuffle=False))
    ts = model.init_state(jax.random.PRNGKey(0), host)
    batch = shard_batch(host, mesh)
    return args, mesh, model, ts, batch


class TestPix2Pix:
    def test_registered(self):
        assert get_model("pix2pix") is not None

    def test_train_step(self):
        args, mesh, model, ts, batch = _setup(
            "pix2pix", n_disc_train=1, add_l1=True, l1_lambda=10.0,
            noise=[], dropout=0, batch_norm_disc=False, batch_norm_gen=False)
        ts, m = model.train(ts, iter([batch, batch]))
        for k in ("g_loss", "d_loss", "l1", "rmse"):
            assert np.isfinite(float(jax.device_get(m[k]))), k

    def test_noise_injection_and_dropout(self):
        args, mesh, model, ts, batch = _setup(
            "pix2pix", n_disc_train=1, add_l1=False, l1_lambda=10.0,
            noise=["input", "latent", "end"], dropout=0.5,
            batch_norm_disc=True, batch_norm_gen=True)
        ts, m = model.train(ts, iter([batch, batch]))
        assert np.isfinite(float(jax.device_get(m["g_loss"])))

    def test_final_layer_bn_and_latent_noise_parity(self):
        """Reference arg_scope quirks (hem/ops/layers.py:125,200 apply BN
        before the activation on EVERY layer in a use_batch_norm scope):
        the decoder's final tanh deconv '8' always carries BN
        (pix2pix.py:196-228), the PatchGAN logits conv m5 carries BN under
        --batch_norm_disc (pix2pix.py:246-260), and 'latent' noise is a
        full bottleneck-width channel block (uniform[batch, 512, 1, 1]
        making d1's input 1024 channels — pix2pix.py:206-208)."""
        args, mesh, model, ts, batch = _setup(
            "pix2pix", n_disc_train=1, add_l1=False, l1_lambda=10.0,
            noise=["latent"], dropout=0, batch_norm_disc=True,
            batch_norm_gen=False)
        g_params = ts["params"]["generator"]
        d_params = ts["params"]["discriminator"]
        n_down = 5  # 32px input
        assert f"d{n_down}_bn" in g_params  # final decoder deconv BN
        assert "m5_bn" in d_params          # logits conv BN
        # latent noise doubles the bottleneck channels: d1 kernel in-dim
        # = 512-capped bottleneck width * 2
        bott = g_params["e5_w"].shape[-1]
        assert g_params["d1_w"].shape[-1] == 2 * bott
        ts, m = model.train(ts, iter([batch, batch]))
        assert np.isfinite(float(jax.device_get(m["g_loss"])))

    def test_eval_and_summaries(self, tmp_path):
        args, mesh, model, ts, batch = _setup(
            "pix2pix", n_disc_train=1, add_l1=False, l1_lambda=10.0,
            noise=[], dropout=0, batch_norm_disc=False, batch_norm_gen=False)
        losses = model.eval_losses(ts, batch)
        assert "d_loss" in losses
        from hemx.summaries.events import EventsWriter
        w = EventsWriter(str(tmp_path))
        model.write_summaries(w, 1, ts, batch)
        w.close()
        from hemx.summaries.reader import get_all_events
        tags = set(get_all_events(str(tmp_path)))
        assert "sampler/sample_variance" in tags


class TestMeanDepthEstimator:
    def test_train_and_predict(self):
        args, mesh, model, ts, batch = _setup("mean_depth_estimator")
        ts, m = model.train(ts, iter([batch]))
        assert np.isfinite(float(jax.device_get(m["m_loss"])))
        pred = np.asarray(jax.device_get(model.predict_mean(ts, batch)))
        assert pred.shape[1] == 1
        assert (pred >= 0).all() and (pred <= 1).all()  # sigmoid output


class TestSamplerGan:
    @pytest.mark.parametrize("darch", ["early", "late"])
    def test_train_step(self, darch):
        args, mesh, model, ts, batch = _setup(
            "sampler_gan", synthetic_shape=[65, 65, 3], batch_size=2,
            garch="small", darch=darch, batch_norm_disc=False,
            batch_norm_gen=False, n_disc_train=1)
        ts, m = model.train(ts, iter([batch, batch]))
        for k in ("g_loss", "d_loss", "rmse", "l1"):
            assert np.isfinite(float(jax.device_get(m[k]))), k

    def test_garch_large(self):
        args, mesh, model, ts, batch = _setup(
            "sampler_gan", synthetic_shape=[65, 65, 3], batch_size=2,
            garch="large", darch="early", batch_norm_disc=False,
            batch_norm_gen=True, n_disc_train=1)
        ts, m = model.train(ts, iter([batch, batch]))
        assert np.isfinite(float(jax.device_get(m["g_loss"])))

    @pytest.mark.parametrize("darch", ["early", "late"])
    def test_output_layer_bn_parity(self, darch):
        """The reference's arg_scopes put BN on the generator's closing
        tanh conv '7' (batch_norm_gen, sampler_gan.py:186-216) and on the
        discriminator's output convs — 'early' h3 (activation=None but BN
        from scope, :238) and 'late' h.b (:257); hem/ops/layers.py:125
        applies BN before/regardless of the activation."""
        args, mesh, model, ts, batch = _setup(
            "sampler_gan", synthetic_shape=[65, 65, 3], batch_size=2,
            garch="small", darch=darch, batch_norm_disc=True,
            batch_norm_gen=True, n_disc_train=1)
        assert "final_bn" in ts["params"]["generator"]
        d_params = ts["params"]["discriminator"]
        assert ("h3_bn" if darch == "early" else "hb_bn") in d_params
        ts, m = model.train(ts, iter([batch, batch]))
        assert np.isfinite(float(jax.device_get(m["g_loss"])))

    def test_depth_crop_31(self):
        args, mesh, model, ts, batch = _setup(
            "sampler_gan", synthetic_shape=[65, 65, 3], batch_size=2,
            garch="small", darch="early", batch_norm_disc=False,
            batch_norm_gen=False, n_disc_train=1)
        g, prep = model._jit_predict(ts, batch)
        assert tuple(prep["y"].shape[1:]) == (31, 31, 1)
        assert tuple(np.asarray(g).shape[1:]) == (31, 31, 1)


class TestPaperCgan:
    @pytest.mark.parametrize("version", ["baseline", "mean_adjusted",
                                         "mean_provided", "mean_provided2"])
    def test_model_versions(self, version):
        args, mesh, model, ts, batch = _setup(
            "paper_cgan", synthetic_shape=[65, 65, 3], batch_size=2,
            model_version=version, training_version="gan",
            g_lr=1e-4, d_lr=1e-4, g_beta1=0.5, d_beta1=0.5,
            g_beta2=0.999, d_beta2=0.999)
        ts, m = model.train(ts, iter([batch, batch]))
        for k in ("g_loss", "d_loss", "rmse"):
            assert np.isfinite(float(jax.device_get(m[k]))), k
        g, prep = model._jit_predict(ts, batch)
        assert tuple(np.asarray(g).shape[1:]) == (29, 29, 1)
        # depth is in meters (0..10 scale)
        assert float(jax.device_get(prep["y"]).max()) > 1.0

    def test_wgan_training(self):
        args, mesh, model, ts, batch = _setup(
            "paper_cgan", synthetic_shape=[65, 65, 3], batch_size=2,
            model_version="mean_adjusted", training_version="wgan",
            g_lr=1e-4, d_lr=1e-4, g_beta1=0.5, d_beta1=0.5,
            g_beta2=0.999, d_beta2=0.999)
        assert model.n_disc_train == 5
        ts, m = model.train(ts, iter([batch] * 6))
        # wgan clips both G and D to +-0.01
        for leaf in jax.tree_util.tree_leaves(ts["params"]):
            arr = np.asarray(jax.device_get(leaf))
            assert abs(arr).max() <= 0.01 + 1e-6

    def test_eigen_metrics(self):
        args, mesh, model, ts, batch = _setup(
            "paper_cgan", synthetic_shape=[65, 65, 3], batch_size=2,
            model_version="baseline", training_version="gan",
            g_lr=1e-4, d_lr=1e-4, g_beta1=0.5, d_beta1=0.5,
            g_beta2=0.999, d_beta2=0.999)
        m = model.eigen_metrics_for(ts, batch)
        assert set(m) >= {"linear_rmse", "log_rmse", "t1", "t2", "t3"}


class TestImprovedSampler:
    PAIRS = [("A1", "A1", 65), ("A2", "A1", 65), ("A3", "A1", 65),
             ("B1", "B1", 66), ("C1", "C1", 66),
             ("B2", "B2", 64), ("D1", "D1", 64), ("E1", "E1", 64)]

    @pytest.mark.parametrize("g_arch,d_arch,size", PAIRS)
    def test_archs(self, g_arch, d_arch, size):
        args, mesh, model, ts, batch = _setup(
            "improved_sampler", synthetic_shape=[size, size, 3], batch_size=2,
            g_arch=g_arch, d_arch=d_arch, g_sparsity=False, g_rmse=False)
        ts, m = model.train(ts, iter([batch]))
        for k in ("g_loss", "d_loss", "rmse", "l1"):
            assert np.isfinite(float(jax.device_get(m[k]))), (g_arch, k)
        g, prep = model._jit_predict(ts, batch)
        expected = 31 if g_arch in ("A1", "A2", "A3", "B1", "C1") else 32
        assert tuple(np.asarray(g).shape[1:]) == (expected, expected, 1), g_arch
        assert tuple(prep["y"].shape[1:]) == (expected, expected, 1)

    def test_sparsity_and_rmse_terms(self):
        args, mesh, model, ts, batch = _setup(
            "improved_sampler", synthetic_shape=[65, 65, 3], batch_size=2,
            g_arch="A3", d_arch="A1", g_sparsity=True, g_rmse=True)
        ts, m = model.train(ts, iter([batch]))
        assert "sparsity_term" in m
        assert np.isfinite(float(jax.device_get(m["g_loss"])))


_PAPER_ADAM = dict(g_lr=1e-4, d_lr=1e-4, g_beta1=0.5, d_beta1=0.9,
                   g_beta2=0.999, d_beta2=0.999)


class TestPaperFamily:
    @pytest.mark.parametrize("site", ["x", "e1", "e3", "e4", "e4-512", "d2",
                                      "d4"])
    def test_paper_sampler_noise_sites(self, site):
        args, mesh, model, ts, batch = _setup(
            "paper_sampler", synthetic_shape=[65, 65, 3], batch_size=2,
            noise_layer=site, e_bn=False, **_PAPER_ADAM)
        ts, m = model.train(ts, iter([batch, batch]))
        for k in ("g_loss", "d_loss", "rmse"):
            assert np.isfinite(float(jax.device_get(m[k]))), (site, k)

    def test_paper_sampler_summaries_with_metrics(self, tmp_path):
        args, mesh, model, ts, batch = _setup(
            "paper_sampler", synthetic_shape=[65, 65, 3], batch_size=2,
            noise_layer="x", e_bn=False, **_PAPER_ADAM)
        model.mean_image = np.full((29, 29), 0.5, np.float32)
        from hemx.summaries.events import EventsWriter
        from hemx.summaries.reader import get_all_events
        w = EventsWriter(str(tmp_path))
        model.write_summaries(w, 1, ts, batch)
        w.close()
        tags = set(get_all_events(str(tmp_path)))
        assert any(t.startswith("metrics_y_hat/") for t in tags)
        assert any(t.startswith("metrics_y_mean/") for t in tags)
        assert any(t.startswith("metrics_y_sampler/") for t in tags)

    def test_paper_noise(self):
        args, mesh, model, ts, batch = _setup(
            "paper_noise", synthetic_shape=[65, 65, 3], batch_size=2,
            model_version="baseline", **_PAPER_ADAM)
        ts, m = model.train(ts, iter([batch, batch]))
        assert np.isfinite(float(jax.device_get(m["g_loss"])))

    @pytest.mark.parametrize("version", ["baseline", "mean_adjusted",
                                         "mean_provided"])
    def test_paper_baseline_sampler(self, version):
        args, mesh, model, ts, batch = _setup(
            "paper_baseline_sampler", synthetic_shape=[65, 65, 3],
            batch_size=2, model_version=version, training_version="gan",
            **_PAPER_ADAM)
        ts, m = model.train(ts, iter([batch, batch]))
        assert np.isfinite(float(jax.device_get(m["g_loss"])))

    @pytest.mark.parametrize("version", ["baseline", "mean_adjusted",
                                         "mean_provided", "mean_provided2"])
    def test_paper_standalone(self, version):
        args, mesh, model, ts, batch = _setup(
            "paper_standalone", synthetic_shape=[65, 65, 3], batch_size=2,
            model_version=version, g_lr=1e-4, g_beta1=0.5, g_beta2=0.999)
        first = None
        for _ in range(4):
            ts, m = model.train(ts, iter([batch]))
            loss = float(jax.device_get(m["rmse"]))
            if first is None:
                first = loss
        assert np.isfinite(loss)
        assert loss < first  # supervised loss should fall fast

    def test_paper_baseline_standalone(self):
        args, mesh, model, ts, batch = _setup(
            "paper_baseline_standalone", synthetic_shape=[65, 65, 3],
            batch_size=2, model_version="mean_adjusted",
            g_lr=1e-4, g_beta1=0.5, g_beta2=0.999)
        ts, m = model.train(ts, iter([batch]))
        assert np.isfinite(float(jax.device_get(m["rmse"])))


class TestDepthRanges:
    def test_paper_models_declare_meter_outputs(self):
        """Every paper-family model whose prepare() scales depth x10 must
        declare depth_range (0,10) so paper_fullimage maps reconstructions
        back to dataset units (regression: paper_standalone lacked it and
        scene rmse read 4.7 instead of ~0.05)."""
        mesh = make_mesh(0)
        for name in ("paper_sampler", "paper_noise", "paper_baseline_sampler",
                     "paper_standalone", "paper_baseline_standalone"):
            # real construction (not cls.__new__): depth_range must stay
            # valid on an initialized instance even if a model ever derives
            # it from construction state
            model = get_model(name)(make_args(model=name, **_PAPER_ADAM,
                                              model_version="baseline"),
                                    mesh)
            assert model.depth_range() == (0.0, 10.0), name


class TestArtist:
    def test_train_and_losses(self):
        args, mesh, model, ts, batch = _setup(
            "artist", synthetic_shape=[65, 65, 3], batch_size=2)
        ts, m = model.train(ts, iter([batch, batch]))
        for k in ("x_loss", "y_loss", "y_hat_rmse"):
            assert np.isfinite(float(jax.device_get(m[k]))), k
        # x step must not change encoder params (donation deletes inputs, so
        # materialize the before-values to host first)
        enc_before = [np.asarray(jax.device_get(l)) for l in
                      jax.tree_util.tree_leaves(ts["params"]["encoder"])]
        ts2, _ = model._jit_x(ts, batch)
        enc_after = jax.tree_util.tree_leaves(ts2["params"]["encoder"])
        for a, b in zip(enc_before, enc_after):
            np.testing.assert_array_equal(a, np.asarray(jax.device_get(b)))


class TestInfoGan:
    def test_train(self):
        args, mesh, model, ts, batch = _setup(
            "info_gan", synthetic_shape=[64, 64, 3], batch_size=2)
        ts, m = model.train(ts, iter([batch] * 3))
        for k in ("g_loss", "d_loss", "q_loss"):
            assert np.isfinite(float(jax.device_get(m[k]))), k


class TestExperimentalSampler:
    def test_composed_with_estimator(self):
        est_args, mesh, est, est_ts, batch = _setup(
            "mean_depth_estimator", synthetic_shape=[64, 64, 3], batch_size=2)
        args2, _, model, ts, batch2 = _setup(
            "experimental_sampler", synthetic_shape=[64, 64, 3], batch_size=2,
            g_sparsity=False, g_rmse=False)
        model.set_estimator(est, est_ts)
        ts = model.init_state(jax.random.PRNGKey(1), jax.device_get(batch2))
        ts, m = model.train(ts, iter([batch2]))
        assert np.isfinite(float(jax.device_get(m["g_loss"])))

    def test_uncomposed_fallback(self):
        args, mesh, model, ts, batch = _setup(
            "experimental_sampler", synthetic_shape=[64, 64, 3], batch_size=2,
            g_sparsity=False, g_rmse=False)
        ts, m = model.train(ts, iter([batch]))
        assert np.isfinite(float(jax.device_get(m["d_loss"])))


class TestFakePlugin:
    def test_registered(self):
        from hemx.models.plugin import get_model
        cls = get_model("test")
        assert cls is not None
        assert "--test_arg" in cls.arguments()
