"""Eigen et al. (2014) monocular-depth evaluation metrics
(reference: paper_metrics.py:12-35, hem/models/paper_sampler.py:304-342).

Parity notes:
* depths arrive in [0,1] and are multiplied by 10 into real-world meters by
  callers, or passed here pre-scaled — ``eigen_metrics`` takes y/y_hat in
  METERS (the reference divides by 10 because its tensors were pre-multiplied
  by 10; net effect: metrics on [0,1]*... — we follow paper_metrics.py and
  compute on depth/10-normalized values when called from eval CLIs);
* ``scale_invariant_log_rmse`` is NOT square-rooted (paper_metrics.py:22) —
  kept as-is;
* threshold accuracies use max(y/ŷ, ŷ/y) < 1.25^k, streamed over a split
  (tf.metrics.percentage_below); ``EigenAccumulator`` reproduces the
  streaming mean.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def eigen_metrics(y, y_hat, eps: float = 1e-8) -> dict:
    """Per-batch Eigen metric dict (pure jnp; jit-safe)."""
    linear_rmse = jnp.sqrt(jnp.mean((y - y_hat) ** 2))
    log_rmse = jnp.sqrt(jnp.mean((jnp.log(y + eps) - jnp.log(y_hat + eps)) ** 2))
    abs_rel_diff = jnp.mean(jnp.abs(y - y_hat) / y_hat)
    squared_rel_diff = jnp.mean((y - y_hat) ** 2 / y_hat)
    d = jnp.log(y + eps) - jnp.log(y_hat + eps)
    # mean(d)^2, NOT sum(d)^2 / n^2: algebraically identical, but n**2 as a
    # Python int overflows the default int32 jit-argument dtype once the
    # batch exceeds ~55k pixels (n=1.7M at the paper_metrics eval size).
    scale_invariant_log_rmse = jnp.mean(d ** 2) - jnp.mean(d) ** 2
    delta = jnp.maximum(y / y_hat, y_hat / y)
    return {
        "linear_rmse": linear_rmse,
        "log_rmse": log_rmse,
        "abs_rel_diff": abs_rel_diff,
        "squared_rel_diff": squared_rel_diff,
        "scale_invariant_log_rmse": scale_invariant_log_rmse,
        "t1": jnp.mean((delta < 1.25).astype(jnp.float32)),
        "t2": jnp.mean((delta < 1.25 ** 2).astype(jnp.float32)),
        "t3": jnp.mean((delta < 1.25 ** 3).astype(jnp.float32)),
    }


class EigenAccumulator:
    """Streaming accumulation over a full split (the reference's
    tf.metrics.percentage_below + running means, paper_metrics.py:115-163).

    NaN results are skipped batch-wise with the mean adjusted (the
    reference's TODO at paper_metrics.py:8 — implemented here).
    """

    def __init__(self):
        self._sums: dict[str, float] = {}
        self._counts: dict[str, int] = {}

    def update(self, metrics: dict) -> None:
        for k, v in metrics.items():
            v = float(v)
            if not np.isfinite(v):
                continue
            self._sums[k] = self._sums.get(k, 0.0) + v
            self._counts[k] = self._counts.get(k, 0) + 1

    def result(self) -> dict:
        return {k: self._sums[k] / self._counts[k] for k in self._sums}
