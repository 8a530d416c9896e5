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
    args = make_args(model="cnn", batch_size=2, epochs=str(epochs),
                     dir=str(tmp_path), seed=seed,
                     synthetic_shape=[32, 32, 3], examples=4, **overrides)
    mesh = make_mesh(0)
    splits = SyntheticDataset.get_datasets(args)
    model = get_model("cnn")(args, mesh)
    result = hemx.train(model, splits, args, mesh)
    return args, result


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

    def test_epoch_size_caps_batches(self, tmp_path):
        args, result = _train(tmp_path, epochs=1, epoch_size=2)
        series = get_tag_values(str(tmp_path / "train"), "losses/loss")
        # 2 train calls -> final step counter is 2
        assert max(s for s, _ in series) == 2
