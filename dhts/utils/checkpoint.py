"""Simulation/training state checkpointing.

The reference only checkpoints at the application layer (controller +
optimizer ``state_dict``s, ``example/control/trainer.py:207-227``); the
simulator itself has none. dhts checkpoints any pytree — ``NetworkState``,
controller params, optimizer state — as msgpack via flax.serialization, so
long rollouts/trainings can resume exactly.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from flax import serialization


def save_pytree(path: str, tree) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host = jax.tree.map(np.asarray, tree)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(host))


def load_pytree(path: str, like):
    """Restore into the structure of ``like`` (shapes must match)."""
    with open(path, "rb") as f:
        blob = f.read()
    return serialization.from_bytes(like, blob)
