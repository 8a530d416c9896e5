"""Fake model plugin named 'test' for registry exercises
(reference: hem/models/test_model.py — a no-op plugin that exists to prove
plugin discovery works)."""

from __future__ import annotations

from hemx.models.plugin import ModelPlugin


class FakeTestModel(ModelPlugin):
    name = "test"

    @staticmethod
    def arguments() -> dict:
        return {"--test_arg": dict(type=int, default=1,
                                   help="Proves plugin args reach the CLI.")}

    def init_state(self, rng, sample_batch) -> dict:
        return {"step": 0}

    def train(self, train_state, stream):
        next(stream)
        return train_state, {"loss": 0.0}

    def eval_losses(self, train_state, batch) -> dict:
        return {"loss": 0.0}
