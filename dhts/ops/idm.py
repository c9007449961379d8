"""IDM (Intelligent Driver Model) microscopic car-following, vectorized.

One pure elementwise function mapping per-vehicle state to acceleration, plus
the explicit-Euler position/speed integrator. Broadcasts over any batch shape
(vehicles, lanes x vehicles, scenarios x lanes x vehicles, ...), so a single
call steps every vehicle in the network — the reference's per-vehicle Python
loop (``road/lane/_micro_lane.py:131-186``) becomes one VPU-wide op.

Functional parity target: reference ``model/micro/_idm.py:5-50``. The two
clamps the reference records as booleans for its hand-written backward pass
(``model/micro/didm.py``) are plain ``jnp.maximum`` here — JAX reverse-mode AD
differentiates through ``maximum`` with exactly the branch-aware zeroing the
reference hand-codes, so no bookkeeping is needed (the booleans are still
returned for tests / diagnostics).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

IDM_DELTA = 4.0  # speed-ratio exponent (reference model/micro/_idm.py:1)
POSITION_DELTA_EPS = 1e-5  # reference road/lane/_micro_lane.py:17


class IdmResult(NamedTuple):
    acceleration: jax.Array
    optimal_spacing: jax.Array
    clipped_acceleration: jax.Array  # bool: negative-speed clamp fired
    clipped_optimal_spacing: jax.Array  # bool: spacing clamp fired


def idm_acceleration(accel_max, accel_pref, speed, target_speed, position_delta,
                     speed_delta, min_space, time_pref, delta_time) -> IdmResult:
    """IDM acceleration with the reference's two safety clamps.

    ``position_delta``: bumper-to-bumper gap to the leading vehicle;
    ``speed_delta``: ego speed minus leader speed. Both clamps match the
    reference exactly: the optimal spacing is clipped at 0 (a negative value
    would reward tailgating a faster leader, reference ``_idm.py:33-41``) and
    the acceleration is clipped at ``-speed/dt`` to prevent negative speeds
    after the Euler update (``_idm.py:46-49``).
    """
    optimal_spacing_raw = (min_space + speed * time_pref +
                           (speed * speed_delta) /
                           (2.0 * jnp.sqrt(accel_max * accel_pref)))
    clipped_spacing = optimal_spacing_raw < 0.0
    optimal_spacing = jnp.maximum(optimal_spacing_raw, 0.0)

    # (v / v0)^4 via squared squares: safe for (transiently) negative speeds,
    # unlike jnp.power with a float exponent.
    speed_ratio_4 = jnp.square(jnp.square(speed / target_speed))
    acc_raw = accel_max * (1.0 - speed_ratio_4 -
                           jnp.square(optimal_spacing / position_delta))

    acc_floor = -speed / delta_time
    clipped_acc = acc_raw < acc_floor
    acc = jnp.maximum(acc_raw, acc_floor)

    return IdmResult(acceleration=acc, optimal_spacing=optimal_spacing,
                     clipped_acceleration=clipped_acc,
                     clipped_optimal_spacing=clipped_spacing)


class MicroStepResult(NamedTuple):
    position: jax.Array
    speed: jax.Array
    acceleration: jax.Array
    collided: jax.Array  # bool per vehicle: raw gap to leader was negative


def euler_step(position, speed, acceleration, delta_time):
    """Explicit-Euler integrate: new position uses the *old* speed.

    Parity: reference ``road/lane/_micro_lane.py:182-183``.
    """
    return position + delta_time * speed, speed + delta_time * acceleration


def micro_lane_step(position, speed, accel_max, accel_pref, target_speed,
                    min_space, time_pref, length, head_position_delta,
                    head_speed_delta, active, delta_time) -> MicroStepResult:
    """Step every vehicle of a lane (or padded batch of lanes) once.

    Vehicles are stored **tail-to-head along the last axis**: slot ``i`` is
    directly behind slot ``i + 1`` (reference ``_micro_lane.py:32-34``), and
    ``active`` marks the live prefix of each row. The per-lane head vehicle —
    the last active slot — uses the lane-level boundary deltas
    ``head_position_delta`` / ``head_speed_delta`` (shape ``[...]``,
    broadcast) instead of an in-lane leader (reference
    ``_micro_lane.py:195-214``).

    Collision handling matches the reference's recovery path: a negative raw
    gap zeroes both deltas for that vehicle (then the gap is floored at
    ``POSITION_DELTA_EPS``) and is reported in ``collided`` (reference
    ``_micro_lane.py:149-166``, which prints a warning and zeroes the deltas).
    Inactive slots are frozen in place with zero acceleration.
    """
    # Leader of slot i is slot i+1; pad the (nonexistent) leader of the last
    # physical slot with zeros — it is always overridden by the head deltas.
    lead_pos = jnp.concatenate(
        [position[..., 1:], jnp.zeros_like(position[..., :1])], axis=-1)
    lead_speed = jnp.concatenate(
        [speed[..., 1:], jnp.zeros_like(speed[..., :1])], axis=-1)
    lead_len = jnp.concatenate(
        [length[..., 1:], jnp.zeros_like(length[..., :1])], axis=-1)
    lead_active = jnp.concatenate(
        [active[..., 1:], jnp.zeros_like(active[..., :1])], axis=-1)

    in_lane_gap = jnp.abs(lead_pos - position) - (lead_len + length) * 0.5
    in_lane_dv = speed - lead_speed

    is_head = active & ~lead_active
    pos_delta = jnp.where(is_head, jnp.asarray(head_position_delta)[..., None],
                          in_lane_gap)
    spd_delta = jnp.where(is_head, jnp.asarray(head_speed_delta)[..., None],
                          in_lane_dv)

    collided = active & (pos_delta < 0.0)
    pos_delta = jnp.where(collided, 0.0, pos_delta)
    spd_delta = jnp.where(collided, 0.0, spd_delta)
    pos_delta = jnp.maximum(pos_delta, POSITION_DELTA_EPS)

    idm = idm_acceleration(accel_max, accel_pref, speed, target_speed,
                           pos_delta, spd_delta, min_space, time_pref,
                           delta_time)
    acc = jnp.where(active, idm.acceleration, 0.0)

    new_pos, new_speed = euler_step(position, speed, acc, delta_time)
    new_pos = jnp.where(active, new_pos, position)
    new_speed = jnp.where(active, new_speed, speed)

    return MicroStepResult(position=new_pos, speed=new_speed, acceleration=acc,
                           collided=collided)
