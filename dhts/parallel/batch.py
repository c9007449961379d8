"""Single-chip scenario batching via vmap.

Everything in :mod:`dhts.models` is a pure function of array pytrees, so a
batch of B independent scenarios is just a leading axis: ``vmap`` the step
or the whole rollout. These helpers cover the common cases used by the
benchmarks and the parallel trainer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dhts.models import network


def broadcast_state(state, batch: int):
    """Tile a NetworkState to a leading batch axis (shared spec)."""
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), state)


def batched_network_rollout(spec, delta_time, num_steps, differentiable,
                            boundary_fn=None, remat=True):
    """Returns ``fn(batched_state) -> (batched_final, diag)``: B scenarios
    advance ``num_steps`` in one device program."""

    def rollout(state):
        def body(s, _):
            s, d = network.network_step(spec, s, delta_time, differentiable,
                                        boundary_fn=boundary_fn)
            return s, d.max_wave_speed

        if remat:
            body = jax.checkpoint(body)
        return jax.lax.scan(body, state, None, length=num_steps)

    return jax.vmap(rollout)
