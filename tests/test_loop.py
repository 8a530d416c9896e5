"""Training-loop integration tests on the CPU mesh (epoch semantics,
baseline checkpoint, resume, +n epochs, summaries, validation/test —
reference behaviors from hem/util/training.py:98-175)."""

import os

import numpy as np
import pytest
import jax

from tests.conftest import make_args

import hemx
from hemx.data.synthetic import SyntheticDataset
from hemx.models.plugin import get_model
from hemx.parallel.mesh import make_mesh
from hemx.summaries.reader import get_all_events, get_tag_values
from hemx.train.checkpoint import CheckpointManager


def _train(tmp_path, epochs, seed=11, **overrides):
    overrides.setdefault("synthetic_count", 32)
    overrides.setdefault("synthetic_shape", [32, 32, 3])
    args = make_args(model="cnn", batch_size=2, epochs=str(epochs),
                     dir=str(tmp_path), seed=seed, examples=4, **overrides)
    mesh = make_mesh(0, spatial=getattr(args, "spatial_parallel", 1))
    splits = SyntheticDataset.get_datasets(args)
    model = get_model("cnn")(args, mesh)
    result = hemx.train(model, splits, args, mesh)
    return args, result


class TestUtils:
    def test_moving_average_per_key_counts(self):
        """A metric present on only some update() calls averages over ITS
        observations (a global call count silently deflated it)."""
        from hemx.utils.terminal import MovingAverage
        avg = MovingAverage()
        avg.update({"a": 1.0})
        out = avg.update({"a": 1.0, "b": 4.0})
        assert out["a"] == pytest.approx(1.0)
        assert out["b"] == pytest.approx(4.0)

    def test_delta_postfix_markers(self):
        """tqdm loss postfix carries the v1 +/-/~ rose/fell/flat marker vs
        the last displayed values (reference util.py:196-212); the first
        display (and first appearance of a key) has no marker."""
        from hemx.utils.terminal import delta_postfix
        first = delta_postfix({"loss": 0.5}, {})
        assert first == {"loss": "0.5"}
        out = delta_postfix({"loss": 0.25, "g": 1.0}, {"loss": 0.5})
        assert out["loss"] == "0.25(-)"
        assert out["g"] == "1"  # new key: no marker
        out = delta_postfix({"loss": 0.3}, {"loss": 0.25})
        assert out["loss"] == "0.3(+)"
        out = delta_postfix({"loss": 0.3}, {"loss": 0.3})
        assert out["loss"] == "0.3(~)"

    def test_fold_rejects_subbatch_input(self):
        """fold() raises on fewer rows than one batch instead of silently
        averaging zero batches to 0.0."""
        from hemx.utils.misc import fold
        arrays = {"x": np.arange(10.0)}
        with pytest.raises(ValueError, match="smaller than one batch"):
            fold(lambda b: float(b["x"].mean()), arrays, 128)
        # drop-remainder batching over full batches
        got = fold(lambda b: float(b["x"].sum()), arrays, 4)
        assert got == pytest.approx(((0+1+2+3) + (4+5+6+7)) / 2)


class TestLoop:
    def test_epoch_train_checkpoint_summaries(self, tmp_path):
        args, result = _train(tmp_path, epochs=2)
        assert result["epoch"] == 2
        mgr = CheckpointManager(str(tmp_path))
        # baseline checkpoint-0 + one per epoch
        assert [e for e, _ in mgr.checkpoints()] == [0, 1, 2]
        # options dump exists and is re-ingestable
        assert os.path.exists(tmp_path / "options.config")
        assert os.path.exists(tmp_path / "options.json")
        # train/validate/test events written
        train_series = get_tag_values(str(tmp_path / "train"), "losses/loss")
        assert len(train_series) >= 2
        assert get_tag_values(str(tmp_path / "validate"), "losses/loss")
        # --test_epochs empty -> the test split is NEVER touched
        # (reference: hem/util/training.py:164-169 — ADVICE r1 fix)
        assert get_tag_values(str(tmp_path / "test"), "losses/loss") == []
        # montages present
        tags = set(get_all_events(str(tmp_path / "train")))
        assert "losses/grad_norm" in tags

    def test_spatial_indivisible_height_rejected(self, tmp_path):
        """--spatial_parallel that does not divide the input height is
        rejected loudly at loop start: batch_spec would otherwise silently
        fall back to data-only sharding and the spatial devices would do
        fully redundant work (config.py --spatial_parallel help says the
        height 'must divide')."""
        with pytest.raises(ValueError, match="spatial_parallel 2"):
            _train(tmp_path, epochs=1, spatial_parallel=2,
                   synthetic_shape=[31, 31, 3])

    def test_test_epochs_trigger(self, tmp_path):
        """The test split runs exactly at --test_epochs."""
        args, result = _train(tmp_path, epochs=2, test_epochs=[1])
        series = get_tag_values(str(tmp_path / "test"), "losses/loss")
        assert len(series) == 1

    def test_resume_plus_n(self, tmp_path):
        _train(tmp_path, epochs=1)
        # +1 epoch resumes from checkpoint-1 and ends at epoch 2
        args, result = _train(tmp_path, epochs="+1")
        assert result["epoch"] == 2
        mgr = CheckpointManager(str(tmp_path))
        assert [e for e, _ in mgr.checkpoints()] == [0, 1, 2]

    def test_absolute_epoch_resume_noop(self, tmp_path):
        _train(tmp_path, epochs=2)
        # asking for 2 epochs again is a no-op (already at epoch 2)
        args, result = _train(tmp_path, epochs=2)
        assert result["epoch"] == 2

    def test_summary_freq_overrides_cadence(self, tmp_path):
        """--summary_freq N writes N in-epoch summaries instead of the
        reference 10x/3x cadence (ADVICE r1: the flag was dead)."""
        # synthetic_count=64, global batch 16 -> 4 batches/epoch. Loss
        # scalars are written at i % cadence == 0 plus end-of-epoch (the
        # step-0 baseline summary has no loss scalar):
        # default epoch-1 cadence (10x) floors to every step -> steps
        # 1,2,3,4; --summary_freq 2 -> cadence 2 -> steps 1,3 + end (4).
        _train(tmp_path / "default", epochs=1, synthetic_count=64)
        _train(tmp_path / "freq2", epochs=1, synthetic_count=64,
               summary_freq=2)
        n_default = len(get_tag_values(str(tmp_path / "default" / "train"),
                                       "losses/loss"))
        n_freq2 = len(get_tag_values(str(tmp_path / "freq2" / "train"),
                                     "losses/loss"))
        assert n_freq2 == 3
        assert n_default == 4

    def test_inference_chunked_drain_matches_manual_average(self, tmp_path):
        """inference() drains the queued eval computations every DRAIN_EVERY
        batches (bounding in-flight HBM, ADVICE r2) — the chunked average
        must equal a naive per-batch fetch over a split LONGER than one
        chunk."""
        from hemx.data.pipeline import make_place
        from hemx.summaries.events import EventsWriter
        from hemx.train.loop import inference

        # global batch 16 (bs2 x 8 devices); 288 eval images -> 18 batches,
        # crossing the 16-batch drain boundary.
        args = make_args(model="cnn", batch_size=2, epochs="1",
                         dir=str(tmp_path), synthetic_count=32,
                         synthetic_eval_count=288,
                         synthetic_shape=[32, 32, 3])
        mesh = make_mesh(0)
        splits = SyntheticDataset.get_datasets(args)
        model = get_model("cnn")(args, mesh)
        gb = args.batch_size * mesh.size
        host = next(splits["train"].iter_epoch(gb, shuffle=False))
        ts = model.init_state(jax.random.PRNGKey(0), host)

        w = EventsWriter(str(tmp_path / "validate"))
        got = inference(model, ts, splits["validate"], args, mesh, w, step=1)
        w.close()

        place = make_place(mesh, splits["validate"], keys=model.batch_keys)
        losses = [jax.device_get(model.eval_losses(ts, place(b)))
                  for b in splits["validate"].iter_epoch(gb, shuffle=False)]
        assert len(losses) == 18
        want = np.mean([float(l["loss"]) for l in losses])
        np.testing.assert_allclose(got["loss"], want, rtol=1e-6)
        assert get_tag_values(str(tmp_path / "validate"), "losses/loss")

    def test_epoch_size_caps_batches(self, tmp_path):
        args, result = _train(tmp_path, epochs=1, epoch_size=2)
        series = get_tag_values(str(tmp_path / "train"), "losses/loss")
        # 2 train calls -> final step counter is 2
        assert max(s for s, _ in series) == 2
