"""Running statistics used to auto-tune soft-sigmoid sharpness.

The reference keeps a fixed-window running mean of observed decision margins
and sets the sigmoid constant to ``16 / |mean|`` (``example/common/rms.py``,
used at ``_env.py:602-617`` and ``_simulator.py:252-261``) — a side-effecting
statistic computed under ``no_grad`` inside the differentiable region.

Two forms are provided:

* :class:`RunningMean` — host-side, window-buffered, for host loops.
* :func:`update_mean_state` — a pure ``(sum, count) -> (sum, count)`` update
  (under ``stop_gradient``) to carry through ``lax.scan``. At the reference's
  horizon (<= a few 10^5 samples per episode vs a 100k window) the unwindowed
  running mean is identical to the reference's windowed one.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class RunningMean:
    """Fixed-window running mean/std (host-side)."""

    def __init__(self, size: int = 100_000):
        self.size = size
        self.data = np.zeros((0,), np.float32)

    def update(self, data):
        data = np.atleast_1d(np.asarray(data, np.float32))
        self.data = np.concatenate([self.data, data])[-self.size:]

    def mean(self):
        return float(np.mean(self.data)) if self.data.size else 0.0

    def std(self):
        return float(np.clip(np.std(self.data), 1e-4, None)) if \
            self.data.size else 1e-4


class MeanState(NamedTuple):
    total: jax.Array  # f32 scalar
    count: jax.Array  # f32 scalar


def init_mean_state() -> MeanState:
    return MeanState(total=jnp.zeros(()), count=jnp.zeros(()))


def update_mean_state(state: MeanState, data) -> MeanState:
    """Accumulate ``data`` (any shape) into the running mean, detached."""
    data = jax.lax.stop_gradient(jnp.asarray(data, jnp.float32))
    return MeanState(total=state.total + jnp.sum(data),
                     count=state.count + data.size)


def update_mean_masked(state: MeanState, data, mask) -> MeanState:
    """Accumulate only ``mask``-selected entries of ``data``, detached."""
    data = jax.lax.stop_gradient(jnp.asarray(data, jnp.float32))
    m = mask.astype(jnp.float32)
    return MeanState(total=state.total + jnp.sum(data * m),
                     count=state.count + jnp.sum(m))


def mean_of(state: MeanState, default=1.0):
    return jnp.where(state.count > 0, state.total / jnp.maximum(
        state.count, 1.0), default)
