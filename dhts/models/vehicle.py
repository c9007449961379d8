"""Vehicle parameter sets and factories (struct-of-arrays).

The reference's ``Vehicle`` / ``MicroVehicle`` objects
(``road/vehicle/vehicle.py:3-18``, ``road/vehicle/micro_vehicle.py:5-122``)
become a NamedTuple of arrays: any leading batch shape works (one vehicle,
a lane's worth ``[V]``, a network's worth ``[L, V]``, scenarios ``[B, L, V]``).

The ancillary scalar ``a`` is the gradient carrier used by hybrid conversion:
it normally equals the vehicle length, but for a vehicle emitted from a macro
lane it carries the flux capacitor's gradient (see
:func:`dhts.ops.dmath.grad_carrier` and reference
``road/network/conversion.py:56-68``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

DEFAULT_VEHICLE_LENGTH = 5.0  # reference road/vehicle/vehicle.py:1


class VehicleParams(NamedTuple):
    """IDM parameters + length + ancillary mass ``a``; arrays broadcast."""

    accel_max: jax.Array
    accel_pref: jax.Array
    target_speed: jax.Array
    min_space: jax.Array
    time_pref: jax.Array
    length: jax.Array
    a: jax.Array


def default_params(speed_limit, shape=(),
                   vehicle_length=DEFAULT_VEHICLE_LENGTH) -> VehicleParams:
    """Deterministic speed-limit-scaled parameters.

    Parity: reference ``MicroVehicle.default_micro_vehicle``
    (``road/vehicle/micro_vehicle.py:30-72``): a_max = v_lim, a_pref =
    0.8 v_lim, v_target = 0.9 v_lim, min_space = 0.1 len, time_pref = 0.1.
    The reference hard-pins vehicle length to DEFAULT_VEHICLE_LENGTH
    (``road_network.py:29,60``); dhts scenes may configure it, so event
    code passes ``spec.vehicle_length`` to keep created vehicles
    consistent with the flux-capacitor threshold and free-space checks.
    """
    full = lambda v: jnp.full(shape, v, jnp.float32)
    length = full(vehicle_length)
    return VehicleParams(
        accel_max=full(speed_limit * 1.0),
        accel_pref=full(speed_limit * 0.8),
        target_speed=full(speed_limit * 0.9),
        min_space=length * 0.1,
        time_pref=full(0.1),
        length=length,
        a=length,
    )


def random_params(key, speed_limit, shape=()) -> VehicleParams:
    """Uniformly random parameters in the reference's ranges.

    Parity: reference ``MicroVehicle.random_micro_vehicle``
    (``road/vehicle/micro_vehicle.py:74-122``), with ``jax.random`` replacing
    the reference's global ``np.random`` state.
    """
    ks = jax.random.split(key, 5)
    uni = lambda k, lo, hi: jax.random.uniform(k, shape, jnp.float32, lo, hi)
    length = jnp.full(shape, DEFAULT_VEHICLE_LENGTH, jnp.float32)
    return VehicleParams(
        accel_max=uni(ks[0], speed_limit * 1.5, speed_limit * 2.0),
        accel_pref=uni(ks[1], speed_limit * 1.0, speed_limit * 1.5),
        target_speed=uni(ks[2], speed_limit * 0.8, speed_limit * 1.2),
        min_space=uni(ks[3], DEFAULT_VEHICLE_LENGTH * 0.2,
                      DEFAULT_VEHICLE_LENGTH * 0.4),
        time_pref=uni(ks[4], 0.2, 0.6),
        length=length,
        a=length,
    )
