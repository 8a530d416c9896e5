"""Experimental sampler — improved_sampler E2 variant composed with a trained
mean_depth_estimator (reference: hem/models/experimental_sampler.py,
driven by experimental.py).

The estimator's per-image mean-depth prediction (under stop-gradient,
experimental_sampler.py:119-141) is broadcast to a constant channel and
concatenated to the generator input alongside x_loc/y_loc. In hemx the
estimate is computed OUTSIDE the sampler's jitted step (the estimator's own
jitted predict on the scene image), which is stop-gradient by construction —
no graph surgery needed. ``set_estimator`` wires the composition; the
entry point ``experimental.py`` trains the estimator first, then this model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hemx.models.improved_sampler import (DISC_SPECS, GEN_SPECS,
                                          ImprovedSampler, spec_discriminator,
                                          spec_generator)
from hemx.ops.images import crop_to_bounding_box


class ExperimentalSampler(ImprovedSampler):
    name = "experimental_sampler"

    @staticmethod
    def arguments() -> dict:
        return {
            "--g_sparsity": dict(action="store_true", default=False),
            "--g_rmse": dict(action="store_true", default=False),
            "--estimator_epochs": dict(type=int, default=30,
                                       help="Phase-1 estimator epochs in the "
                                            "experimental.py composition "
                                            "(reference: experimental.py:51)."),
        }

    def __init__(self, args, mesh, estimator=None):
        super().__init__(args, mesh)
        self.estimator = estimator
        self.estimator_ts = None

    def set_estimator(self, estimator, estimator_ts) -> None:
        self.estimator = estimator
        self.estimator_ts = estimator_ts

    def _mean_channel(self, batch):
        """(B,1,1,1) predicted mean depth, frozen wrt the sampler's grads."""
        if self.estimator is not None and self.estimator_ts is not None:
            m = self.estimator.predict_mean(self.estimator_ts, batch)
            return jnp.asarray(m).reshape(-1, 1, 1, 1)
        # fall back to the dataset-provided mean channel when uncomposed
        if "mean" in batch:
            return jnp.mean(batch["mean"], axis=(1, 2, 3), keepdims=True)
        return jnp.mean(batch["depth"], axis=(1, 2, 3), keepdims=True)

    def prepare(self, batch, ctx):
        x = 2.0 * (batch["image"] - 0.5)
        y = 2.0 * (batch["depth"] - 0.5)
        y = crop_to_bounding_box(y, 16, 16, 32, 32)
        mean = jnp.broadcast_to(batch["mean_estimate"].reshape(-1, 1, 1, 1),
                                x.shape[:3] + (1,))
        x = jnp.concatenate([x, batch["x_loc"], batch["y_loc"], mean], axis=-1)
        return {"g_input": x, "y": y, "d_x": x}

    def build_nets(self, prep):
        # E2 == the E1 (SAME 64px) spec with the estimator channel
        return {"generator": spec_generator(GEN_SPECS["E1"]),
                "discriminator": spec_discriminator(DISC_SPECS["E1"])}

    def _attach_mean(self, batch):
        m = self._mean_channel(batch)
        return {**batch, "mean_estimate": m}

    def train(self, ts, stream):
        batch = self._attach_mean(next(stream))
        ts, d_metrics = self._jit_d(ts, batch)
        ts, g_metrics = self._jit_g(ts, batch)
        return ts, {**d_metrics, **g_metrics}

    def eval_losses(self, ts, batch) -> dict:
        return self._jit_eval(ts, self._attach_mean(batch))

    def init_state(self, rng, sample_batch) -> dict:
        batch = {k: jnp.asarray(np.asarray(v)) for k, v in sample_batch.items()}
        return super().init_state(rng, self._attach_mean(batch))

    def write_summaries(self, writer, step, ts, batch) -> None:
        # no host round-trip: the summary batch is already device-resident
        # (train() attaches the mean to device batches the same way, line
        # 78), and every re-upload leaks host RSS on this PJRT client
        # (CLAUDE.md) — the same pattern improved_sampler.write_summaries
        # avoids
        batch = self._attach_mean({k: jnp.asarray(v)
                                   for k, v in batch.items()})
        super().write_summaries(writer, step, ts, batch)
