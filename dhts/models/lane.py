"""Standalone single-lane rollouts: the minimum end-to-end slice.

These wrap the physics ops into ``lax.scan`` rollouts for one isolated lane
with fixed boundary conditions — exactly the setting of the reference's
single-lane inverse benchmarks (``example/inverse/macro.py`` with constant
ghost cells, ``example/inverse/micro.py`` with the default virtual leader).
The network layer (:mod:`dhts.models.network`) generalizes this to coupled
multi-lane scenes; these helpers stay because they are the fastest path for
the single-lane case (no boundary gathers) and serve as the reference point
for tests.

Everything here vmaps over a leading scenario/batch axis — batched
optimization restarts and CMA-ES populations evaluate in one device program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dhts.models.vehicle import VehicleParams
from dhts.ops import arz, idm


class MacroRollout(NamedTuple):
    r: jax.Array  # [C] final density
    y: jax.Array  # [C] final relative flow
    u: jax.Array  # [C] final speed
    max_wave_speed: jax.Array  # scalar: CFL diagnostic over the whole rollout


def macro_rollout(r0, u0, left_r, left_u, right_r, right_u, speed_limit,
                  delta_time, cell_length, num_steps, *, unroll=4,
                  remat=False) -> MacroRollout:
    """Roll a macro (ARZ) lane ``num_steps`` with fixed ghost cells.

    Mirrors ``dMacroLane`` stepping with constant leftmost/rightmost boundary
    cells (reference ``road/lane/_macro_lane.py:83-146`` inside the
    ``example/inverse/macro.py`` setup), as one fused scan: no per-step
    Python, no per-step dispatch, gradients by native AD through the scan
    (optionally rematerialized with ``remat=True`` for long horizons).
    """
    y0 = arz.compute_y(r0, u0, speed_limit)

    def body(carry, _):
        r, y = carry
        res = arz.godunov_step(r, y, left_r, left_u, right_r, right_u,
                               speed_limit, delta_time, cell_length)
        return (res.r, res.y), res.max_wave_speed

    if remat:
        body = jax.checkpoint(body)
    (rT, yT), speeds = jax.lax.scan(body, (r0, y0), None, length=num_steps,
                                    unroll=unroll)
    return MacroRollout(r=rT, y=yT, u=arz.compute_u(rT, yT, speed_limit),
                        max_wave_speed=jnp.max(speeds))


class MicroRollout(NamedTuple):
    position: jax.Array  # [V]
    speed: jax.Array  # [V]
    any_collision: jax.Array  # bool diagnostic


def micro_rollout(position0, speed0, params: VehicleParams, active,
                  head_position_delta, head_speed_delta, delta_time, num_steps,
                  *, unroll=4, remat=False) -> MicroRollout:
    """Roll a micro (IDM) lane ``num_steps`` with fixed head-vehicle deltas.

    Mirrors ``dMicroLane`` stepping (reference ``road/lane/_micro_lane.py:
    131-186``) for an isolated lane: the head vehicle sees the constant
    virtual leader ``(head_position_delta, head_speed_delta)`` (defaults
    1000 / 0 in the reference, ``_micro_lane.py:14-15``).
    """

    def body(carry, _):
        p, v = carry
        res = idm.micro_lane_step(
            p, v, accel_max=params.accel_max, accel_pref=params.accel_pref,
            target_speed=params.target_speed, min_space=params.min_space,
            time_pref=params.time_pref, length=params.length,
            head_position_delta=head_position_delta,
            head_speed_delta=head_speed_delta, active=active,
            delta_time=delta_time)
        return (res.position, res.speed), jnp.any(res.collided)

    if remat:
        body = jax.checkpoint(body)
    (pT, vT), coll = jax.lax.scan(body, (position0, speed0), None,
                                  length=num_steps, unroll=unroll)
    return MicroRollout(position=pT, speed=vT, any_collision=jnp.any(coll))
