"""Checkpoint manager — epoch-keyed, resume-by-dir.

Replaces tf.train.Saver/Supervisor (reference: hem/util/misc.py:129-153,
hem/util/state.py:14-34, hem/util/training.py:126-130,162):

* one baseline checkpoint at step 0 before any training;
* one checkpoint per epoch, named ``checkpoint-{epoch}``;
* ``max_to_keep`` most-recent retained (0 = keep all);
* pointing ``--dir`` at a populated workspace resumes from the latest.

Serialization is flax msgpack over a dict pytree
``{"train_state": {params, mstate, opt, step, rng}, "epoch"}`` (the wrapper
loop.train saves/restores) — there is no meta-graph;
post-hoc tooling rebuilds the model from options.json and restores params
(SURVEY.md §5.4 rebuild note).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization

_CKPT_RE = re.compile(r"^checkpoint-(\d+)\.msgpack$")


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 0):
        self.directory = directory
        self.max_to_keep = max_to_keep
        os.makedirs(directory, exist_ok=True)

    # -- listing ----------------------------------------------------------
    def checkpoints(self) -> list[tuple[int, str]]:
        """Sorted [(epoch, path)] (reference: util.py:379-387 checkpoints())."""
        found = []
        for fname in os.listdir(self.directory):
            m = _CKPT_RE.match(fname)
            if m:
                found.append((int(m.group(1)), os.path.join(self.directory, fname)))
        return sorted(found)

    def latest(self) -> Optional[str]:
        ckpts = self.checkpoints()
        return ckpts[-1][1] if ckpts else None

    # -- save/restore -----------------------------------------------------
    def save(self, train_state: Any, epoch: int) -> str:
        path = os.path.join(self.directory, f"checkpoint-{epoch}.msgpack")
        data = serialization.to_bytes(_to_host(train_state))
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        self._gc()
        return path

    def restore(self, template: Any, path: Optional[str] = None) -> Any:
        """Restore into the structure of ``template`` (a freshly-initialized
        train state)."""
        path = path or self.latest()
        if path is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        with open(path, "rb") as f:
            return serialization.from_bytes(template, f.read())

    def _gc(self) -> None:
        if self.max_to_keep <= 0:
            return
        ckpts = self.checkpoints()
        for _, path in ckpts[:-self.max_to_keep]:
            try:
                os.remove(path)
            except OSError:
                pass
