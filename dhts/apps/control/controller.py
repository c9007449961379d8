"""MLP signal controller (flax).

Parity target: reference ``example/control/controller.py:3-35`` — a plain
MLP (Linear + Tanh per hidden layer, default 256x256) mapping the schedule
observation to one raw value per signal phase per intersection. The trainer
squashes the raw output into the action box with a sigmoid (reference
``trainer.py:183-188``).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class Controller(nn.Module):
    output_size: int
    network_size: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, obs):
        x = obs
        for width in self.network_size:
            x = nn.tanh(nn.Dense(width)(x))
        return nn.Dense(self.output_size)(x)


def squash_action(raw, low, high):
    """Map raw controller output into the action box [low, high]."""
    return low + (high - low) * jax.nn.sigmoid(raw)


def init_controller(key, obs_size, output_size, network_size=(256, 256)):
    model = Controller(output_size=output_size, network_size=network_size)
    params = model.init(key, jnp.zeros((obs_size,), jnp.float32))
    return model, params
