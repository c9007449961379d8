"""Unit tests for the vectorized IDM step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dhts.ops import idm

from . import oracles


def test_idm_acceleration_matches_oracle():
    rng = np.random.default_rng(0)
    n = 256
    a_max = rng.uniform(10.0, 60.0, n)
    a_pref = rng.uniform(10.0, 50.0, n)
    v = rng.uniform(0.0, 30.0, n)
    v0 = rng.uniform(10.0, 40.0, n)
    dp = rng.uniform(1e-5, 50.0, n)
    dv = rng.uniform(-20.0, 20.0, n)
    s0 = rng.uniform(0.5, 2.0, n)
    T = rng.uniform(0.1, 0.6, n)
    dt = 0.01

    res = idm.idm_acceleration(*(jnp.asarray(x, jnp.float32)
                                 for x in (a_max, a_pref, v, v0, dp, dv, s0,
                                           T)), dt)
    got = np.asarray(res.acceleration)
    for i in range(n):
        ref = oracles.idm_acc(a_max[i], a_pref[i], v[i], v0[i], dp[i], dv[i],
                              s0[i], T[i], dt)
        assert got[i] == pytest.approx(ref, rel=1e-3, abs=1e-2), i


def test_clamp_flags():
    # big negative dv with big v -> spacing clamp fires
    res = idm.idm_acceleration(10.0, 10.0, 20.0, 30.0, 5.0, -50.0, 1.0, 0.1,
                               0.01)
    assert bool(res.clipped_optimal_spacing)
    assert float(res.optimal_spacing) == 0.0
    # tiny gap -> huge deceleration -> clipped at -v/dt
    res = idm.idm_acceleration(10.0, 10.0, 20.0, 30.0, 1e-5, 0.0, 1.0, 0.1,
                               0.01)
    assert bool(res.clipped_acceleration)
    assert float(res.acceleration) == pytest.approx(-20.0 / 0.01, rel=1e-5)


def _lane_arrays(pos, vel, speed_limit=30.0, V=8):
    n = len(pos)
    pad = V - n
    f = lambda x, fill: jnp.asarray(np.concatenate([x, np.full(pad, fill)]),
                                    jnp.float32)
    pos = f(np.asarray(pos, np.float64), 0.0)
    vel = f(np.asarray(vel, np.float64), 0.0)
    ones = np.ones(n)
    params = dict(
        accel_max=f(ones * speed_limit, speed_limit),
        accel_pref=f(ones * speed_limit * 0.8, speed_limit * 0.8),
        target_speed=f(ones * speed_limit * 0.9, speed_limit * 0.9),
        min_space=f(ones * 0.5, 0.5),
        time_pref=f(ones * 0.1, 0.1),
        length=f(ones * 5.0, 5.0),
    )
    active = jnp.asarray(np.arange(V) < n)
    return pos, vel, params, active


def test_micro_lane_step_leader_relation():
    """Slot i follows slot i+1; the head uses the boundary deltas."""
    dt = 0.01
    pos, vel, params, active = _lane_arrays([0.0, 20.0, 45.0], [10.0, 5.0,
                                                                20.0])
    res = idm.micro_lane_step(pos, vel, **params, head_position_delta=1000.0,
                              head_speed_delta=0.0, active=active,
                              delta_time=dt)
    # scalar oracle per vehicle
    gaps = [20.0 - 0.0 - 5.0, 45.0 - 20.0 - 5.0, 1000.0]
    dvs = [10.0 - 5.0, 5.0 - 20.0, 0.0]
    for i, (g, dv) in enumerate(zip(gaps, dvs)):
        ref = oracles.idm_acc(30.0, 24.0, float(vel[i]), 27.0, g, dv, 0.5, 0.1,
                              dt)
        assert float(res.acceleration[i]) == pytest.approx(ref, rel=1e-4,
                                                           abs=1e-3)
        assert float(res.position[i]) == pytest.approx(
            float(pos[i]) + dt * float(vel[i]), rel=1e-6)
    # padding slots frozen
    assert float(res.position[5]) == 0.0
    assert float(res.acceleration[5]) == 0.0


def test_collision_recovery_zeroes_deltas():
    dt = 0.01
    # overlapping vehicles -> negative gap
    pos, vel, params, active = _lane_arrays([0.0, 3.0], [10.0, 10.0])
    res = idm.micro_lane_step(pos, vel, **params, head_position_delta=1000.0,
                              head_speed_delta=0.0, active=active,
                              delta_time=dt)
    assert bool(res.collided[0])
    ref = oracles.idm_acc(30.0, 24.0, 10.0, 27.0, oracles.EPS, 0.0, 0.5, 0.1,
                          dt)
    assert float(res.acceleration[0]) == pytest.approx(ref, rel=1e-4)


def test_negative_speed_prevented_over_rollout():
    dt = 0.02
    pos, vel, params, active = _lane_arrays([0.0, 7.0], [25.0, 0.0])

    def body(carry, _):
        p, v = carry
        res = idm.micro_lane_step(p, v, **params, head_position_delta=1000.0,
                                  head_speed_delta=0.0, active=active,
                                  delta_time=dt)
        return (res.position, res.speed), res.speed

    (_, vT), speeds = jax.lax.scan(body, (pos, vel), None, length=200)
    assert float(jnp.min(speeds)) >= -1e-4


def test_micro_gradients_match_finite_difference():
    dt = 0.01
    pos0, vel0, params, active = _lane_arrays([0.0, 12.0, 30.0],
                                              [10.0, 15.0, 5.0])

    @jax.jit
    def rollout(p, v):
        def body(carry, _):
            p, v = carry
            res = idm.micro_lane_step(p, v, **params,
                                      head_position_delta=1000.0,
                                      head_speed_delta=0.0, active=active,
                                      delta_time=dt)
            return (res.position, res.speed), None

        (pT, vT), _ = jax.lax.scan(body, (p, v), None, length=100)
        return jnp.sum(pT**2) * 1e-3 + jnp.sum(vT**2) * 1e-2

    g_p, g_v = jax.jit(jax.grad(rollout, argnums=(0, 1)))(pos0, vel0)
    assert np.all(np.isfinite(np.asarray(g_p)))
    for idx in [0, 1, 2]:
        eps = 1e-2
        fd = (rollout(pos0.at[idx].add(eps), vel0) -
              rollout(pos0.at[idx].add(-eps), vel0)) / (2 * eps)
        assert float(g_p[idx]) == pytest.approx(float(fd), rel=0.05, abs=1e-3)
