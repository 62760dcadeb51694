"""Checkpoint / resume for training state.

The reference's only resume mechanism is stage-level artifact caching
("skip if output exists", reference: model/count_co_events.py:84-89,
model/w2vec_aids.py:49-53); a crash mid-training restarts the stage. Here
training loops additionally checkpoint their full state (params, optimizer
accumulators, step counter, RNG key) so long runs resume mid-stage — the
Orbax-style sharded-array checkpointing noted in SURVEY.md §5.4, kept
dependency-light: pytree leaves -> npz + structure manifest.
"""
from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Optional, Tuple

import jax
import numpy as np


def save_checkpoint(path: str, state: Any, step: int) -> None:
    """Atomically persist a pytree + step counter."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    payload["__step__"] = np.asarray(step, np.int64)
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    os.close(fd)
    try:
        np.savez(tmp, **payload)
        # np.savez appends .npz to the name
        os.replace(tmp + ".npz", path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def load_checkpoint(path: str, like: Any) -> Optional[Tuple[Any, int]]:
    """Restore a pytree with the structure of `like`. None if absent."""
    if not os.path.exists(path):
        return None
    z = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    restored = [
        jax.numpy.asarray(z[f"leaf_{i}"]) for i in range(len(leaves))
    ]
    state = jax.tree_util.tree_unflatten(treedef, restored)
    return state, int(z["__step__"])
